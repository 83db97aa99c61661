"""Serving-surface generation latency at the documented B=64 sweet spot.

VQAInferenceSession.generate_batch (ViT enc-dec family): greedy and beam-3
answer generation end-to-end through the serving session — collate (host)
+ jit generate (device) + token decode — vs the raw classification
ask_batch path. B=64 is the ViT family's serving sweet spot (per-image cost
rises at B=128; benchmarks/vit_forward.md).

Usage: python benchmarks/bench_serving_generation.py [batch]
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ROUNDS = 5


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from t5_resnet_vqa_tpu.data.synthetic import make_synthetic_daquar
    from t5_resnet_vqa_tpu.eval.session import VQAInferenceSession
    from t5_resnet_vqa_tpu.models.vit_vqa import VitVQAModel

    t0 = time.time()
    float(jnp.ones(()).sum())
    log(f"tunnel warmup: {time.time() - t0:.1f}s "
        f"(device: {jax.devices()[0].platform})")

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    root, kw = make_synthetic_daquar("/tmp/gen_bench_daquar", num_train=2,
                                     num_test=B, num_images=B,
                                     image_size=224)
    answers = [a.strip() for a in
               open(os.path.join(root, kw["answer_spaces_file"]))]

    model = VitVQAModel(answer_spaces=len(answers), dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    params = model.init(
        jax.random.PRNGKey(0),
        question_input_ids=np.zeros((1, 16), np.int32),
        question_attention_masks=np.ones((1, 16), np.int32),
        decoder_question_input_ids=np.zeros((1, 20), np.int32),
        decoder_question_attention_masks=np.ones((1, 20), np.int32),
        pixel_values=rng.random((1, 224, 224, 3)).astype(np.float32),
    )["params"]

    session = VQAInferenceSession(model, params, answers, "vit",
                                  batch_size=B)
    images_dir = os.path.join(root, kw["images_dir"])
    imgs = sorted(os.path.join(images_dir, f)
                  for f in os.listdir(images_dir))
    reqs = [(imgs[i % len(imgs)], f"what is on the table {i}?")
            for i in range(B)]

    results = {}
    for tag, run in [
        ("classify_top5", lambda: session.ask_batch(reqs, top_k=5)),
        ("greedy", lambda: session.generate_batch(reqs,
                                                  max_answer_length=5)),
        ("beam3", lambda: session.generate_batch(reqs, num_beams=3,
                                                 max_answer_length=5)),
    ]:
        t0 = time.time()
        out = run()
        log(f"{tag}: compile+first {time.time() - t0:.1f}s")
        times = []
        for _ in range(ROUNDS):
            t0 = time.time()
            out = run()
            times.append(time.time() - t0)
        dt = min(times)
        results[tag] = {"ms_per_batch": round(dt * 1e3, 1),
                        "answers_per_sec": round(B / dt, 1)}
        log(f"{tag}: {dt * 1e3:.1f} ms/batch({B}) = {B / dt:.0f} answers/s")
        assert len(out) == B

    print(json.dumps({"bench": "serving_generation", "batch": B,
                      "results": results}))


if __name__ == "__main__":
    main()
