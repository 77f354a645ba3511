"""Real-TPU validation gate for EVERY Pallas kernel (tests/ run CPU
interpret mode only — this script compiles the kernels with Mosaic on the
actual chip and checks parity + microbenchmarks vs the XLA references).

    python benchmarks/run_tpu_checks.py     # from the repo root

Writes benchmarks/TPU_CHECKS.json (git-sha stamped). Policy (round-2
verdict): no Pallas kernel may become a TPU default unless this gate is
green at HEAD and its artifact is committed. Production-shape fused-agg
perf numbers live in benchmarks/fused_agg_bench.py -> FUSED_AGG.json.
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def git_sha() -> str:
    try:
        return subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, cwd=os.path.dirname(__file__),
        ).stdout.strip()
    except Exception:
        return "unknown"


def timeit(fn, *args, iters=20):
    """On-device scan timing (per-dispatch RPC overhead is ~30ms here)."""
    @jax.jit
    def many(*a):
        def body(acc, _):
            return acc + fn(*a).astype(jnp.float32).sum(), None
        tot, _ = jax.lax.scan(body, 0.0, jnp.arange(iters))
        return tot
    float(many(*args))  # compile+warm
    t0 = time.perf_counter()
    float(many(*args))
    return (time.perf_counter() - t0) / iters


def check_cost_volume(results: dict) -> None:
    from ecm_tpu.ops.cost_volume import (
        cost_volume_concat_jnp,
        cost_volume_correlation_jnp,
    )
    from ecm_tpu.ops.pallas_cost_volume import cost_volume_pallas

    rng = np.random.default_rng(0)
    # production-shaped: KITTI 384x1248 at 1/4 res, C=32, D/4=48
    B, H, W, C, D = 1, 96, 312, 32, 48
    fl = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))
    fr = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))

    for mode, ref_fn in (
        ("concat", cost_volume_concat_jnp),
        ("correlation", cost_volume_correlation_jnp),
    ):
        ref = ref_fn(fl, fr, D)
        out = cost_volume_pallas(fl, fr, D, mode=mode)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=1e-6, atol=1e-6
        )
        t_ref = timeit(lambda a, b: ref_fn(a, b, D).sum(), fl, fr)
        t_pal = timeit(
            lambda a, b: cost_volume_pallas(a, b, D, mode=mode).sum(), fl, fr
        )
        out_bytes = np.prod(ref.shape) * 4
        bw = out_bytes / t_pal / 1e9
        results[f"cost_volume_{mode}"] = {
            "match": True,
            "jnp_ms": round(t_ref * 1e3, 3),
            "pallas_ms": round(t_pal * 1e3, 3),
            "pallas_write_gbps": round(bw, 1),
        }
        print(
            f"cost_volume/{mode}: MATCH. jnp {t_ref * 1e3:.2f} ms, pallas "
            f"{t_pal * 1e3:.2f} ms ({t_ref / t_pal:.2f}x), write-bw {bw:.0f} GB/s"
        )

    # grouped (disparity-folded) emission — what the real TPU model consumes
    from ecm_tpu.ops.cost_volume import cost_volume_grouped_jnp
    from ecm_tpu.ops.pallas_cost_volume import cost_volume_concat_grouped_pallas

    refg = cost_volume_grouped_jnp(fl, fr, D, "concat")
    outg = cost_volume_concat_grouped_pallas(fl, fr, D)
    np.testing.assert_allclose(
        np.asarray(outg), np.asarray(refg), rtol=1e-6, atol=1e-6
    )
    t_refg = timeit(lambda a, b: cost_volume_grouped_jnp(a, b, D, "concat").sum(),
                    fl, fr)
    t_palg = timeit(
        lambda a, b: cost_volume_concat_grouped_pallas(a, b, D).sum(), fl, fr
    )
    bwg = np.prod(refg.shape) * 4 / t_palg / 1e9
    results["cost_volume_grouped"] = {
        "match": True,
        "jnp_ms": round(t_refg * 1e3, 3),
        "pallas_ms": round(t_palg * 1e3, 3),
        "pallas_write_gbps": round(bwg, 1),
    }
    print(
        f"cost_volume/grouped: MATCH. jnp {t_refg * 1e3:.2f} ms, pallas "
        f"{t_palg * 1e3:.2f} ms ({t_refg / t_palg:.2f}x), write-bw {bwg:.0f} GB/s"
    )

    # gradient parity compiled
    def loss_p(fl, fr):
        return jnp.sum(cost_volume_pallas(fl, fr, D, mode="concat") ** 2)

    def loss_j(fl, fr):
        return jnp.sum(cost_volume_concat_jnp(fl, fr, D) ** 2)

    gp = jax.jit(jax.grad(loss_p, argnums=(0, 1)))(fl, fr)
    gj = jax.jit(jax.grad(loss_j, argnums=(0, 1)))(fl, fr)
    for a, b in zip(gp, gj):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)
    results["cost_volume_backward"] = {"match": True}
    print("cost_volume backward: MATCH (compiled)")


def check_regression(results: dict) -> None:
    """Fused upsample+soft-argmin vs trilinear+softargmin on a FIXED cost
    volume (random-weight full-model comparisons are ill-conditioned)."""
    from ecm_tpu.ops.pallas_regression import fused_upsample_softargmin
    from ecm_tpu.ops.softargmin import disparity_regression
    from ecm_tpu.ops.upsample import upsample_trilinear

    rng = np.random.default_rng(1)
    B, D4, H4, W4, MAXD = 1, 48, 96, 312, 192
    cost4 = jnp.asarray(rng.normal(size=(B, D4, H4, W4)).astype(np.float32))

    out = jax.jit(lambda c: fused_upsample_softargmin(c, MAXD))(cost4)

    def ref_fn(c):
        with jax.default_matmul_precision("highest"):
            full = upsample_trilinear(c, (MAXD, 4 * H4, 4 * W4))
            return disparity_regression(full, MAXD)

    ref = jax.jit(ref_fn)(cost4)
    err = float(jnp.abs(out - ref).max())
    assert err < 0.05, err  # disparities in [0, 192); 0.05 px
    t = timeit(lambda c: fused_upsample_softargmin(c, MAXD), cost4)
    results["fused_regression"] = {
        "max_abs_err_px": round(err, 4),
        "pallas_ms": round(t * 1e3, 3),
    }
    print(f"fused_regression: MATCH (max {err:.4f} px), {t * 1e3:.2f} ms")


def check_fused_agg(results: dict) -> None:
    """Mosaic-compiles the fused aggregation kernel at the production channel
    widths / W (what the alignment constraints care about); B/D/H reduced to
    keep the gate fast — full-shape perf is fused_agg_bench.py."""
    from ecm_tpu.ops.pallas_fused_agg import (
        _fused_conv3d_pair_pallas,
        fused_conv3d_pair_reference,
    )

    rng = np.random.default_rng(2)
    B, D, H, W = 1, 16, 16, 312
    dt = jnp.bfloat16
    cases = [
        ("dres0+ctx", 64, 32, 32, dict(use_ctx=True)),
        ("dres1+res", 32, 32, 32, dict(relu2=False, residual=True)),
        ("classif", 32, 32, 1, dict(relu2=False)),
    ]
    for label, cin, cm, cout, opts in cases:
        opts = dict(opts)
        x = jnp.asarray(rng.normal(size=(B, D, H, W, cin)).astype(np.float32)).astype(dt)
        k1 = jnp.asarray(rng.normal(size=(3, 3, 3, cin, cm)).astype(np.float32) * 0.1)
        k2 = jnp.asarray(rng.normal(size=(3, 3, 3, cm, cout)).astype(np.float32) * 0.1)
        s1 = jnp.asarray(rng.uniform(0.5, 1.5, cm).astype(np.float32))
        b1 = jnp.asarray(rng.normal(size=cm).astype(np.float32) * 0.1)
        s2 = jnp.asarray(rng.uniform(0.5, 1.5, cout).astype(np.float32))
        b2 = jnp.asarray(rng.normal(size=cout).astype(np.float32) * 0.1)
        ctx = None
        if opts.pop("use_ctx", False):
            ctx = jnp.asarray(
                rng.normal(size=(B, H, W, cout)).astype(np.float32)
            ).astype(dt)
        out = _fused_conv3d_pair_pallas(x, k1, s1, b1, k2, s2, b2, ctx=ctx, **opts)
        ref = fused_conv3d_pair_reference(x, k1, s1, b1, k2, s2, b2, ctx=ctx, **opts)
        err = float(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32)).max())
        scale = float(jnp.abs(ref.astype(jnp.float32)).max())
        rel = err / max(scale, 1e-9)
        assert rel < 0.02, (label, err, scale)
        results[f"fused_agg_{label}"] = {"rel_err": round(rel, 6), "compiles": True}
        print(f"fused_agg/{label}: Mosaic COMPILES, parity rel={rel:.2e}")


def check_gband(results: dict) -> None:
    """Mosaic-compiles the gband grouped-conv kernel at the production lane
    widths (g4/Cin32, g4/Cin64, g2/Cin64, Cout1) with W=312; Dg/H reduced to
    keep the gate fast — full-shape perf is gband_bench.py."""
    from ecm_tpu.ops.pallas_gband import gband_conv_bn_s1, gband_reference

    rng = np.random.default_rng(3)
    # no cout=1 case: a 4-lane output block is not expressible as an aligned
    # Mosaic memref slice ("dimension must be aligned to tiling (128)"), and
    # the model never dispatches gband for the classif exit conv (GConv3D
    # keeps the XLA banded path there)
    cases = [
        ("dres_c", 4, 32, 32, True, 312),
        ("dres0_1", 4, 64, 32, True, 312),
        ("hg_conv2", 2, 64, 64, False, 312),
        # W % 8 != 0 exercises the automatic "refs" fallback (the roll form's
        # output DMA needs 8-aligned W). Eval padding only guarantees
        # W/4 % 4 == 0, so this compile path IS reachable at serving — gate
        # it on-chip too (round-4 advisor, medium).
        ("dres_c_w308", 4, 32, 32, True, 308),
    ]
    for label, g, cin, cout, relu, w in cases:
        dg, h = 3, 8
        xg = jnp.asarray(
            rng.normal(size=(1, dg, h, w, g * cin)).astype(np.float32)
        ).astype(jnp.bfloat16)
        k = jnp.asarray(
            (rng.normal(size=(3, 3, 3, cin, cout)) * 0.1).astype(np.float32)
        ).astype(jnp.bfloat16)
        scale = jnp.asarray(
            rng.uniform(0.5, 1.5, cout).astype(np.float32)
        )
        bias = jnp.asarray((rng.normal(size=cout) * 0.1).astype(np.float32))
        out = gband_conv_bn_s1(xg, k, scale, bias, g=g, relu=relu)
        ref = gband_reference(xg, k, scale, bias, g=g, relu=relu)
        err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32))))
        sc = float(jnp.max(jnp.abs(ref.astype(jnp.float32))))
        rel = err / max(sc, 1e-9)
        assert rel < 0.02, (label, err, sc)
        results[f"gband_{label}"] = {"rel_err": round(rel, 6), "compiles": True}
        print(f"gband/{label}: Mosaic COMPILES, parity rel={rel:.2e}")

    # stride-2 down kernel (g4 -> g2, the hourglass-encoder entry conv)
    from ecm_tpu.ops.pallas_gband import gband_down_conv_bn, gband_down_reference

    g, cin, cout, dg, h, w = 4, 32, 64, 3, 8, 312
    xg = jnp.asarray(
        rng.normal(size=(1, dg, h, w, g * cin)).astype(np.float32)
    ).astype(jnp.bfloat16)
    k = jnp.asarray(
        (rng.normal(size=(3, 3, 3, cin, cout)) * 0.1).astype(np.float32)
    ).astype(jnp.bfloat16)
    scale = jnp.asarray(rng.uniform(0.5, 1.5, cout).astype(np.float32))
    bias = jnp.asarray((rng.normal(size=cout) * 0.1).astype(np.float32))
    out = gband_down_conv_bn(xg, k, scale, bias)
    ref = gband_down_reference(xg, k, scale, bias)
    err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32))))
    sc = float(jnp.max(jnp.abs(ref.astype(jnp.float32))))
    rel = err / max(sc, 1e-9)
    assert rel < 0.02, ("gband_down", err, sc)
    results["gband_down"] = {"rel_err": round(rel, 6), "compiles": True}
    print(f"gband_down: Mosaic COMPILES, parity rel={rel:.2e}")

    # classif-head cascade (conv1 + Cout=1 conv2, intermediate in VMEM)
    from ecm_tpu.ops.pallas_gband import (
        gband_classif_head,
        gband_classif_reference,
    )

    g, cin, dg, h, w = 4, 32, 3, 8, 312
    xg = jnp.asarray(
        rng.normal(size=(1, dg, h, w, g * cin)).astype(np.float32)
    ).astype(jnp.bfloat16)
    k1 = jnp.asarray(
        (rng.normal(size=(3, 3, 3, cin, cin)) * 0.1).astype(np.float32)
    ).astype(jnp.bfloat16)
    k2 = jnp.asarray(
        (rng.normal(size=(3, 3, 3, cin, 1)) * 0.1).astype(np.float32)
    ).astype(jnp.bfloat16)
    s1 = jnp.asarray(rng.uniform(0.5, 1.5, cin).astype(np.float32))
    b1 = jnp.asarray((rng.normal(size=cin) * 0.1).astype(np.float32))
    b2 = jnp.asarray((rng.normal(size=1) * 0.1).astype(np.float32))
    out = gband_classif_head(xg, k1, s1, b1, k2, b2)
    ref = gband_classif_reference(xg, k1, s1, b1, k2, b2)
    err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32))))
    sc = float(jnp.max(jnp.abs(ref.astype(jnp.float32))))
    rel = err / max(sc, 1e-9)
    assert rel < 0.02, ("gband_classif", err, sc)
    results["gband_classif"] = {"rel_err": round(rel, 6), "compiles": True}
    print(f"gband_classif: Mosaic COMPILES, parity rel={rel:.2e}")

    # padded-flow chain (emit_padded / prepadded_w / add_padded): the
    # dres-chain form the model dispatches at w % 8 == 0
    g, cin, dgx, hx, wx = 4, 32, 3, 8, 312
    xg = jnp.asarray(
        rng.normal(size=(1, dgx, hx, wx, g * cin)).astype(np.float32)
    ).astype(jnp.bfloat16)
    ks = [
        jnp.asarray(
            (rng.normal(size=(3, 3, 3, cin, cin)) * 0.1).astype(np.float32)
        ).astype(jnp.bfloat16)
        for _ in range(3)
    ]
    sc = jnp.asarray(rng.uniform(0.5, 1.5, cin).astype(np.float32))
    bi_ = jnp.asarray((rng.normal(size=cin) * 0.1).astype(np.float32))
    addu = jnp.asarray(
        rng.normal(size=(1, 1, hx, wx, g * cin)).astype(np.float32)
    ).astype(jnp.bfloat16)
    p1 = gband_conv_bn_s1(xg, ks[0], sc, bi_, emit_padded=True)
    p2 = gband_conv_bn_s1(
        p1, ks[1], sc, bi_, add=addu, prepadded_w=wx, emit_padded=True
    )
    outp = gband_conv_bn_s1(
        p2, ks[2], sc, bi_, relu=False, add=p1, prepadded_w=wx, add_padded=True
    )
    r1 = gband_reference(xg, ks[0], sc, bi_)
    r2 = gband_reference(r1, ks[1], sc, bi_, add=addu)
    refp = gband_reference(r2, ks[2], sc, bi_, relu=False, add=r1)
    err = float(jnp.max(jnp.abs(outp.astype(jnp.float32) - refp.astype(jnp.float32))))
    scm = float(jnp.max(jnp.abs(refp.astype(jnp.float32))))
    rel = err / max(scm, 1e-9)
    assert rel < 0.03, ("gband_padded_flow", err, scm)
    results["gband_padded_flow"] = {"rel_err": round(rel, 6), "compiles": True}
    print(f"gband_padded_flow: Mosaic COMPILES, chain parity rel={rel:.2e}")

    # fused grouped-emission transposed conv (hourglass conv6 exit op) —
    # deconv + BN fold + residual add, subpixel interleave baked into the
    # packed-kernel lane arrangement (ops/pallas_gdeconv.py)
    from ecm_tpu.ops.pallas_gdeconv import gdeconv4_bn, gdeconv4_reference

    cin, cout = 64, 32
    x = jnp.asarray(
        rng.normal(size=(1, 8, 8, 156, cin)).astype(np.float32)
    ).astype(jnp.bfloat16)
    k = jnp.asarray(
        (rng.normal(size=(3, 3, 3, cin, cout)) * 0.1).astype(np.float32)
    ).astype(jnp.bfloat16)
    scale = jnp.asarray(rng.uniform(0.5, 1.5, cout).astype(np.float32))
    bias = jnp.asarray((rng.normal(size=cout) * 0.1).astype(np.float32))
    addv = jnp.asarray(
        rng.normal(size=(1, 4, 16, 312, 4 * cout)).astype(np.float32)
    ).astype(jnp.bfloat16)
    out = gdeconv4_bn(x, k, scale, bias, add=addv)
    ref = gdeconv4_reference(x, k, scale, bias, add=addv)
    err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32))))
    sc = float(jnp.max(jnp.abs(ref.astype(jnp.float32))))
    rel = err / max(sc, 1e-9)
    assert rel < 0.02, ("gdeconv4", err, sc)
    t_pal = timeit(lambda a: gdeconv4_bn(a, k, scale, bias, add=addv).sum(), x)
    t_ref = timeit(lambda a: gdeconv4_reference(a, k, scale, bias, add=addv).sum(), x)
    results["gdeconv4"] = {
        "rel_err": round(rel, 6),
        "compiles": True,
        "pallas_ms": round(t_pal * 1e3, 3),
        "xla_chain_ms": round(t_ref * 1e3, 3),
    }
    print(
        f"gdeconv4: Mosaic COMPILES, parity rel={rel:.2e}, "
        f"pallas {t_pal * 1e3:.2f} ms vs xla {t_ref * 1e3:.2f} ms"
    )

    # fused epilogue adds (ctx broadcast + residual) on the dres_c shape
    for alabel, dga in (("ctx", 1), ("residual", 3)):
        g, cin, cout, dg, h, w = 4, 32, 32, 3, 8, 312
        xg = jnp.asarray(
            rng.normal(size=(1, dg, h, w, g * cin)).astype(np.float32)
        ).astype(jnp.bfloat16)
        k = jnp.asarray(
            (rng.normal(size=(3, 3, 3, cin, cout)) * 0.1).astype(np.float32)
        ).astype(jnp.bfloat16)
        scale = jnp.asarray(rng.uniform(0.5, 1.5, cout).astype(np.float32))
        bias = jnp.asarray((rng.normal(size=cout) * 0.1).astype(np.float32))
        add = jnp.asarray(
            rng.normal(size=(1, dga, h, w, g * cout)).astype(np.float32)
        ).astype(jnp.bfloat16)
        out = gband_conv_bn_s1(xg, k, scale, bias, g=g, add=add)
        ref = gband_reference(xg, k, scale, bias, g=g, add=add)
        err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32))))
        sc = float(jnp.max(jnp.abs(ref.astype(jnp.float32))))
        rel = err / max(sc, 1e-9)
        assert rel < 0.02, (alabel, err, sc)
        results[f"gband_add_{alabel}"] = {"rel_err": round(rel, 6), "compiles": True}
        print(f"gband_add/{alabel}: Mosaic COMPILES, parity rel={rel:.2e}")


def main():
    assert jax.default_backend() == "tpu", jax.default_backend()
    results = {"git": git_sha(), "device": str(jax.devices()[0])}
    check_cost_volume(results)
    check_regression(results)
    check_fused_agg(results)
    check_gband(results)
    out_path = os.path.join(os.path.dirname(__file__), "TPU_CHECKS.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print("ALL KERNELS GREEN ->", out_path)


if __name__ == "__main__":
    main()
