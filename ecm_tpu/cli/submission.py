"""KITTI test-server submission (reference component T3, ``submission.py`` —
SURVEY.md 2.3/3.3): loads a checkpoint, pads each test pair to 384x1248
(top/right), runs eval forward, un-pads, writes uint16 PNGs
(disparity * 256) ready for the KITTI server.

    python -m ecm_tpu.cli.submission --datapath /data/kitti2015 \
        --loadmodel ./ckpt_kitti --outdir ./disp_0
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp

from ecm_tpu.cli.common import base_parser, eval_mesh, resolve_config
from ecm_tpu.data.kitti import list_kitti, load_sample, save_disp_png
from ecm_tpu.data.preprocess import unpad
from ecm_tpu.parallel.sharding import replicate, use_mesh
from ecm_tpu.train import checkpoint as ckpt_lib
from ecm_tpu.train.state import create_train_state
from ecm_tpu.train.steps import make_infer_fn


def main(argv: list[str] | None = None) -> None:
    parser = base_parser("ECM-TPU KITTI submission (reference submission.py)")
    parser.add_argument("--outdir", default="disp_0")
    parser.add_argument("--datatype", default="2015", choices=["2012", "2015"])
    args = parser.parse_args(argv)
    cfg = resolve_config(args, default_preset="kitti_infer")

    model = cfg.model.build()
    state = create_train_state(model, jax.random.PRNGKey(0), (384, 1248, 3))
    if args.loadmodel:
        state, step0 = ckpt_lib.restore_latest(
            ckpt_lib.make_manager(args.loadmodel), state
        )
        print(f"loaded checkpoint step {step0}")
    infer = make_infer_fn(
        model, {"params": state.params, "batch_stats": state.batch_stats}
    )

    year = 2015 if args.datatype == "2015" else 2012
    specs, _ = list_kitti(cfg.data.datapath, year=year, split="testing")
    os.makedirs(args.outdir, exist_ok=True)
    # BASELINE config 4: --mesh-disp N shards the volume's disparity axis
    mesh = eval_mesh(cfg)
    with use_mesh(mesh):
        for spec in specs:
            sample = load_sample(spec, crop=None)
            t0 = time.perf_counter()
            left = jnp.asarray(sample["left"])[None]
            right = jnp.asarray(sample["right"])[None]
            if mesh is not None:
                left, right = jax.device_put((left, right), replicate(mesh))
            disp = infer(left, right)
            disp = jax.device_get(disp)[0]
            dt = time.perf_counter() - t0
            disp = unpad(disp, tuple(sample["pads"]))
            out = os.path.join(args.outdir, os.path.basename(spec.left))
            save_disp_png(out, disp)
            print(f"{out}  {dt * 1e3:.1f} ms")


if __name__ == "__main__":
    main()
