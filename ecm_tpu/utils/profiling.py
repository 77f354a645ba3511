"""Tracing / profiling helpers (SURVEY.md section 5: the reference has none;
the build provides jax.profiler traces + roofline accounting as first-class).
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(logdir: str = "/tmp/ecm_tpu_trace"):
    """Capture a Perfetto/XProf trace of the enclosed block.

    View with: xprof / tensorboard --logdir <logdir>.
    """
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def timed(fn, *args, iters: int = 10, warmup: int = 2) -> float:
    """Median-free simple wall timing with block_until_ready. NOTE: on this
    machine's relay-attached TPU, prefer an on-device lax.scan loop (see
    bench.py) — per-dispatch RPC overhead is ~30 ms."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def flops_stereo_forward(
    h: int, w: int, max_disp: int, c: int = 32, layer2_blocks: int = 16
) -> float:
    """Analytic FLOP count (multiply-add = 2 FLOPs) of the flagship forward —
    used for roofline/utilization reporting in benchmarks."""
    h2, w2 = h // 2, w // 2
    h4, w4 = h // 4, w // 4
    d4 = max_disp // 4
    f = 0.0
    # stem
    f += 2 * 27 * 3 * 32 * h2 * w2 + 2 * 2 * 27 * 32 * 32 * h2 * w2
    # layer1 (3 blocks, 32ch, H/2)
    f += 3 * 2 * 2 * 27 * 32 * 32 * h2 * w2
    # layer2 (first 32->64 s2 + downsample, rest 64ch, H/4)
    f += 2 * 27 * 32 * 64 * h4 * w4 + 2 * 27 * 64 * 64 * h4 * w4
    f += (layer2_blocks - 1) * 2 * 2 * 27 * 64 * 64 * h4 * w4
    # layer3/4 (3 + 3 blocks, 64->128 then 128ch)
    f += 2 * 27 * 64 * 128 * h4 * w4 + 2 * 27 * 128 * 128 * h4 * w4 * 11
    # SPP convs + fusion
    f += 4 * 2 * 128 * 32 * h4 * w4 + 2 * 9 * 320 * 128 * h4 * w4 + 2 * 128 * 32 * h4 * w4
    f *= 2  # siamese: both images
    # 3D aggregation
    n = d4 * h4 * w4
    f3 = 2 * 27 * 64 * c * n + 2 * 27 * c * c * n  # dres0
    f3 += 2 * 2 * 27 * c * c * n  # dres1
    per_hg = (
        2 * 27 * c * 2 * c * n / 8  # conv1 s2
        + 2 * 27 * 4 * c * c * n / 8  # conv2 (2c->2c at /8)... approximations
        + 2 * 27 * 4 * c * c * n / 64 * 2  # conv3, conv4
        + 2 * 27 * 4 * c * c * n / 8  # deconv5
        + 2 * 27 * 2 * c * c * n  # deconv6 to full volume res
    )
    f3 += 3 * per_hg
    f3 += 3 * (2 * 27 * c * c * n + 2 * 27 * c * 1 * n)  # classif heads
    return f + f3
