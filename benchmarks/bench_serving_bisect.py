"""Per-segment bisect of the serving ask_batch wall (VERDICT r3 weak #1).

Round 3 measured end-to-end serving at B=64 = 282.5 ms/batch (227
answers/s) vs 8 620 device-forward pairs/s and noted "decode dominates"
without evidence. This script produces the per-segment breakdown of one
ask_batch(B) call and measures the attack surface:

  decode       file -> RGB uint8 (cv2.imread + cvtColor)
  resize       uint8 resize to the model geometry (+ batch pack)
  tokenize     question text -> [B, S] ids/mask
  h2d          jax.device_put of the packed batch (+ block)
  compute      the jitted predict program on device-resident inputs
  fetch+decode log_probs fetch + top-k answer decode

and then the end-to-end path with the opt-in knobs:

  baseline           full decode (reference-exact pixels)
  reduced_decode=2   cv2.IMREAD_REDUCED_COLOR_2 (DCT-scaled for JPEG)
  jpeg source        same corpus stored as JPEG (DAQUAR ships PNG; a
                     serving deployment can transcode its corpus once)

plus the pixel/answer parity delta of each variant vs baseline.

Sources are 640x480 (real DAQUAR/NYU-Depth geometry — round 3's serving
bench used 224^2 files on disk, understating the decode+resize wall).

Usage: python benchmarks/bench_serving_bisect.py [batch] [family]
       family in {cnn, vit} (default cnn = the flagship)
       "host" as the family runs HOST-ONLY (forces the CPU platform, no
       session/device segments): decode/resize/tokenize/collate timings for
       every variant (png/jpg x full/reduced) + pixel parity — the decode
       wall is pure host work, so this mode carries the bisect even when
       the TPU tunnel is down.
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ROUNDS = 8


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _timeit(fn, rounds=ROUNDS):
    fn()                                   # warm caches / compiles
    times = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return min(times)


def _corpus(B):
    """640x480 PNG corpus + a JPEG-90 twin.

    Images are PHOTO-LIKE (smooth low-frequency base + a few hard-edged
    shapes + mild sensor noise), not uniform noise: noise is pathological
    for both codecs (JPEG-90 of noise decodes SLOWER than PNG and reduced
    decode loses ~30 LSB; real indoor photos are piecewise smooth, which is
    what DAQUAR/NYU-Depth frames are)."""
    import cv2

    from t5_resnet_vqa_tpu.data.synthetic import make_synthetic_daquar

    root, kw = make_synthetic_daquar(
        "/tmp/serve_bisect_daquar", num_train=2, num_test=B, num_images=B,
        image_size=256, source_hw=(480, 640))
    answers = [a.strip() for a in
               open(os.path.join(root, kw["answer_spaces_file"]))]
    images_dir = os.path.join(root, kw["images_dir"])
    png_paths = sorted(os.path.join(images_dir, f)
                       for f in os.listdir(images_dir))[:B]
    # overwrite the synthetic noise frames with photo-like content
    rng = np.random.default_rng(0)
    for p in png_paths:
        base = rng.integers(0, 256, size=(30, 40, 3), dtype=np.uint8)
        img = cv2.resize(base, (640, 480),
                         interpolation=cv2.INTER_CUBIC)   # smooth base
        for _ in range(12):                               # furniture-ish
            x0, y0 = rng.integers(0, 600), rng.integers(0, 440)
            w, h = rng.integers(20, 200), rng.integers(20, 160)
            color = tuple(int(c) for c in rng.integers(0, 256, 3))
            cv2.rectangle(img, (int(x0), int(y0)),
                          (int(x0 + w), int(y0 + h)), color, -1)
        noise = rng.normal(0, 2.0, img.shape)             # mild sensor noise
        img = np.clip(img.astype(np.float32) + noise, 0, 255).astype(np.uint8)
        cv2.imwrite(p, img[:, :, ::-1])
    jpg_dir = os.path.join(root, "images_jpg")
    os.makedirs(jpg_dir, exist_ok=True)
    jpg_paths = []
    for p in png_paths:
        q = os.path.join(jpg_dir, os.path.basename(p).replace(".png", ".jpg"))
        # unconditional: the PNGs above are rewritten every call, so a
        # cached twin from an older corpus would silently desync
        cv2.imwrite(q, cv2.imread(p), [cv2.IMWRITE_JPEG_QUALITY, 90])
        jpg_paths.append(q)
    return answers, png_paths, jpg_paths


def host_only(B):
    """Host-segment bisect + variant sweep, no device required."""
    import cv2

    from t5_resnet_vqa_tpu.data.collate import DaquarCnnCollate
    from t5_resnet_vqa_tpu.data.preprocessing import decode_image

    answers, png_paths, jpg_paths = _corpus(B)
    target_hw = 256

    seg = {}
    decoded = [decode_image(p) for p in png_paths]
    seg["decode_png_ms"] = _timeit(
        lambda: [decode_image(p) for p in png_paths]) * 1e3
    seg["decode_jpg_ms"] = _timeit(
        lambda: [decode_image(p) for p in jpg_paths]) * 1e3

    def resize_pack():
        out = np.empty((B, target_hw, target_hw, 3), np.uint8)
        for i, img in enumerate(decoded):
            out[i] = cv2.resize(img, (target_hw, target_hw),
                                interpolation=cv2.INTER_LINEAR)
        return out
    seg["resize_pack_ms"] = _timeit(resize_pack) * 1e3

    collate = DaquarCnnCollate(answers, resizing_dimensions=(256, 256),
                               eval_mode=True, emit_uint8=True)
    texts = [f"what is on the table {i}?" for i in range(B)]
    seg["tokenize_ms"] = _timeit(
        lambda: collate.tokenizer(texts, 16)) * 1e3

    variants = {}
    for tag, reduced, paths in [("png_full", 0, png_paths),
                                ("png_reduced2", 2, png_paths),
                                ("png_reduced4", 4, png_paths),
                                ("jpg_full", 0, jpg_paths),
                                ("jpg_reduced2", 2, jpg_paths),
                                ("jpg_reduced4", 4, jpg_paths)]:
        c = DaquarCnnCollate(answers, resizing_dimensions=(256, 256),
                             eval_mode=True, emit_uint8=True,
                             reduced_decode=reduced)
        dt = _timeit(lambda: c.load_images(paths))
        variants[tag] = {"ms_per_batch": round(dt * 1e3, 1),
                         "images_per_sec": round(B / dt, 1)}
        log(f"{tag}: {dt * 1e3:.1f} ms/batch({B}) = {B / dt:.0f} images/s")

    # pixel parity deltas vs the reference-exact png_full pixels
    base = DaquarCnnCollate(answers, resizing_dimensions=(256, 256),
                            eval_mode=True,
                            emit_uint8=True).load_images(png_paths[:8])
    base = base.astype(np.int32)
    pix = {}
    for tag, reduced, paths in [("png_reduced2", 2, png_paths),
                                ("jpg_full", 0, jpg_paths),
                                ("jpg_reduced2", 2, jpg_paths)]:
        c = DaquarCnnCollate(answers, resizing_dimensions=(256, 256),
                             eval_mode=True, emit_uint8=True,
                             reduced_decode=reduced)
        d = np.abs(c.load_images(paths[:8]).astype(np.int32) - base)
        pix[tag] = {"mean_abs_lsb": round(float(d.mean()), 3),
                    "p99_abs_lsb": round(float(np.percentile(d, 99)), 1)}
    log(f"pixel deltas vs png_full: {pix}")

    print(json.dumps({"bench": "serving_bisect_host_only", "batch": B,
                      "segments_ms": {k: round(v, 2)
                                      for k, v in seg.items()},
                      "variants": variants, "pixel_delta": pix}))


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    family = sys.argv[2] if len(sys.argv) > 2 else "cnn"

    if family == "host":
        import jax
        jax.config.update("jax_platforms", "cpu")
        host_only(B)
        return

    import cv2
    import jax
    import jax.numpy as jnp

    from t5_resnet_vqa_tpu.data.preprocessing import decode_image
    from t5_resnet_vqa_tpu.eval.session import VQAInferenceSession

    t0 = time.time()
    float(jnp.ones(()).sum())
    log(f"tunnel warmup: {time.time() - t0:.1f}s "
        f"(device: {jax.devices()[0].platform})")

    # 640x480 PHOTO-LIKE sources + JPEG-90 twin — the same corpus as
    # host_only mode (the first on-chip run measured the raw synthetic
    # noise frames, which are codec-pathological: JPEG of noise decodes
    # SLOWER than PNG and reduced decode loses ~30 LSB).
    answers, png_paths, jpg_paths = _corpus(B)

    if family == "cnn":
        from t5_resnet_vqa_tpu.models.resnet_vqa import ResnetVQAModel
        model = ResnetVQAModel(answer_spaces=len(answers),
                               vision_model_name="resnet50",
                               dtype=jnp.bfloat16)
        rng = np.random.default_rng(0)
        init = dict(
            question_input_ids=np.zeros((1, 16), np.int32),
            question_attention_masks=np.ones((1, 16), np.int32),
            image_tensors=rng.random((1, 256, 256, 3)).astype(np.float32))
        target_hw = 256
    else:
        from t5_resnet_vqa_tpu.models.vit_vqa import VitVQAModel
        model = VitVQAModel(answer_spaces=len(answers), dtype=jnp.bfloat16)
        rng = np.random.default_rng(0)
        init = dict(
            question_input_ids=np.zeros((1, 16), np.int32),
            question_attention_masks=np.ones((1, 16), np.int32),
            decoder_question_input_ids=np.zeros((1, 20), np.int32),
            decoder_question_attention_masks=np.ones((1, 20), np.int32),
            pixel_values=rng.random((1, 224, 224, 3)).astype(np.float32))
        target_hw = 224
    params = model.init(jax.random.PRNGKey(0), **init)["params"]

    def make_session(reduced=0):
        return VQAInferenceSession(
            model, params, answers, family, batch_size=B, image_size=256,
            reduced_decode=reduced)

    session = make_session()
    reqs_png = [(png_paths[i], f"what is on the table {i}?")
                for i in range(B)]
    reqs_jpg = [(jpg_paths[i], f"what is on the table {i}?")
                for i in range(B)]

    # ---------------- segment bisect (baseline PNG path) ----------------
    seg = {}
    decoded = [decode_image(p) for p in png_paths]
    seg["decode_ms"] = _timeit(
        lambda: [decode_image(p) for p in png_paths]) * 1e3

    def resize_pack():
        out = np.empty((B, target_hw, target_hw, 3), np.uint8)
        for i, img in enumerate(decoded):
            out[i] = cv2.resize(img, (target_hw, target_hw),
                                interpolation=cv2.INTER_LINEAR)
        return out
    seg["resize_pack_ms"] = _timeit(resize_pack) * 1e3

    texts = [q for _, q in reqs_png]
    seg["tokenize_ms"] = _timeit(
        lambda: session.collate.tokenizer(texts, 16)) * 1e3

    batch = session._collate_chunk(reqs_png)
    seg["collate_total_ms"] = _timeit(
        lambda: session._collate_chunk(reqs_png)) * 1e3

    def h2d():
        dev = jax.device_put(batch)
        jax.block_until_ready(dev)
        return dev
    seg["h2d_ms"] = _timeit(h2d) * 1e3
    dev_batch = h2d()

    def compute():
        out = session._predict(session._params, dev_batch)
        np.asarray(out)     # fetch = the only sync through the tunnel
    seg["compute_plus_fetch_ms"] = _timeit(compute) * 1e3

    log_probs = np.asarray(session._predict(session._params, dev_batch))
    seg["answer_decode_ms"] = _timeit(
        lambda: session._decode(log_probs[:B], 1)) * 1e3

    log("segments (ms): " + json.dumps(
        {k: round(v, 1) for k, v in seg.items()}))

    # ---------------- end-to-end variants ----------------
    variants = {}
    base_out = None
    for tag, reduced, reqs in [
            ("png_full", 0, reqs_png),
            ("png_reduced2", 2, reqs_png),
            ("jpg_full", 0, reqs_jpg),
            ("jpg_reduced2", 2, reqs_jpg)]:
        s = make_session(reduced)
        s._predict = session._predict          # share the compiled program
        dt = _timeit(lambda: s.ask_batch(reqs, top_k=1), rounds=ROUNDS)
        out = s.ask_batch(reqs, top_k=1)
        if base_out is None:
            base_out = out
        agree = float(np.mean([a["answer"] == b["answer"]
                               for a, b in zip(base_out, out)]))
        variants[tag] = {"ms_per_batch": round(dt * 1e3, 1),
                         "answers_per_sec": round(B / dt, 1),
                         "answer_agreement_vs_baseline": round(agree, 4)}
        log(f"{tag}: {dt * 1e3:.1f} ms/batch = {B / dt:.0f} answers/s, "
            f"agreement {agree:.3f}")

    # ---------------- streaming throughput (multi-chunk pipeline) -------
    # One ask_batch(B) call is a single compiled chunk: collate -> h2d ->
    # compute -> fetch run SERIALLY, so the measured latency stacks every
    # segment. ask_batch with 4B requests dispatches all four chunks before
    # fetching any — chunk k+1's decode/transfer overlaps chunk k's device
    # work (dispatches through the tunnel are async). THIS is the serving
    # steady state; the single-chunk number above is cold-start latency.
    streaming = {}
    for tag, reduced, reqs in [("png_full", 0, reqs_png),
                               ("jpg_reduced2", 2, reqs_jpg)]:
        s = make_session(reduced)
        s._predict = session._predict
        stream = (reqs * 4)[:4 * B]
        dt = _timeit(lambda: s.ask_batch(stream, top_k=1), rounds=4)
        streaming[tag] = {"ms_per_chunk": round(dt * 1e3 / 4, 1),
                          "answers_per_sec": round(4 * B / dt, 1)}
        log(f"stream {tag}: {dt * 1e3 / 4:.1f} ms/chunk steady = "
            f"{4 * B / dt:.0f} answers/s")

    # pixel parity delta of reduced decode (uint8 LSBs, resized geometry)
    full = session.collate.load_images(png_paths[:8]).astype(np.int32)
    red = make_session(2).collate.load_images(png_paths[:8]).astype(np.int32)
    pix = {"mean_abs_lsb": float(np.mean(np.abs(full - red))),
           "p99_abs_lsb": float(np.percentile(np.abs(full - red), 99))}
    log(f"reduced-decode pixel delta vs full (uint8 LSB): {pix}")

    print(json.dumps({"bench": "serving_bisect", "batch": B,
                      "family": family, "segments_ms":
                      {k: round(v, 2) for k, v in seg.items()},
                      "variants": variants, "streaming": streaming,
                      "pixel_delta": pix}))


if __name__ == "__main__":
    main()
