"""Serve a trained VQA checkpoint over HTTP (JSON API; one chip by default,
``--data-parallel/--model-parallel`` shard the batch/params over a mesh).

New TPU-framework surface — the reference has no serving path at all (its
only inference is the heatmap CLIs' inline loops, CNN_vqa_heatmap.py:89-200).
Restores best-model + answer space via the model_ckpt_info.json checkpoint
contract, compiles one fixed-batch predict program, and exposes
/healthz, /v1/ask, /v1/ask_batch and (ViT enc-dec family) /v1/generate —
see t5_resnet_vqa_tpu/eval/http_server.py for the protocol.

    python serve_vqa.py --config vit_daquar_config.json --port 8000 \
        [--batch-size 64] [--set trainer.output_dir=/path/to/run]

    curl -s localhost:8000/healthz
    curl -s -X POST localhost:8000/v1/ask -d \
        '{"image_path": "/data/images/image3.png", \
          "question": "what is on the table?", "top_k": 3}'
"""

import argparse

from t5_resnet_vqa_tpu.core import Config, select_device
from t5_resnet_vqa_tpu.eval import VQAInferenceSession
from t5_resnet_vqa_tpu.eval.http_server import VQAHTTPServer


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", default="vit_daquar_config.json",
                   help="six-group JSON config (reference layout accepted)")
    p.add_argument("--set", action="append", default=[], metavar="GROUP.KEY=V",
                   help="config override, e.g. trainer.output_dir=/run")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--batch-size", type=int, default=64,
                   help="compiled serving batch (64 = measured sweet spot)")
    p.add_argument("--top-k", type=int, default=1,
                   help="default top_k when a request omits it")
    p.add_argument("--image-root", default=None,
                   help="allowlist root for request image_path values; "
                        "required for image_path on non-loopback --host "
                        "(remote clients may always send image_b64)")
    p.add_argument("--data-parallel", type=int, default=1, metavar="DP",
                   help="shard the serving batch DP ways over a device "
                        "mesh (multi-chip serving; batch-size must divide)")
    p.add_argument("--model-parallel", type=int, default=1, metavar="TP",
                   help="tensor-parallel degree on the mesh model axis "
                        "(same Megatron specs as training)")
    args = p.parse_args()

    cfg = Config.from_json(args.config, overrides=args.set)
    select_device(cfg.trainer.device)
    mesh = None
    if args.data_parallel * args.model_parallel > 1:
        # validate BEFORE the (slow) checkpoint restore, with real messages
        # instead of make_mesh's numpy reshape error / the session
        # constructor's late divisibility check (ADVICE r4)
        import jax
        n = len(jax.devices())
        want = args.data_parallel * args.model_parallel
        if want > n:
            p.error(f"--data-parallel {args.data_parallel} x "
                    f"--model-parallel {args.model_parallel} = {want} "
                    f"devices, but only {n} available")
        if args.batch_size % args.data_parallel:
            p.error(f"--batch-size {args.batch_size} must be divisible by "
                    f"--data-parallel {args.data_parallel} (each data shard "
                    f"serves batch/dp pairs)")
        from t5_resnet_vqa_tpu.parallel.sharding import make_mesh
        mesh = make_mesh(args.data_parallel, args.model_parallel)
        print(f"serving mesh: {dict(mesh.shape)}", flush=True)
    session = VQAInferenceSession.from_checkpoint(
        cfg, batch_size=args.batch_size, mesh=mesh)
    server = VQAHTTPServer(session, host=args.host, port=args.port,
                           default_top_k=args.top_k, logger=print,
                           image_root=args.image_root)
    print(f"serving {session._family} family "
          f"({len(session.answer_spaces)}-answer space) "
          f"on http://{server.host}:{server.port} "
          f"(batch {session.batch_size})", flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.close()


if __name__ == "__main__":
    main()
