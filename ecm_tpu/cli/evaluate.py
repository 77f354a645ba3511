"""Stand-alone evaluation (the reference folds this into ``main.py::test`` /
``finetune.py``'s val loop — SURVEY.md 2.3): computes EPE / D1-all / k-px
rates over a SceneFlow test split or KITTI val split.

    python -m ecm_tpu.cli.evaluate --datapath /data/sceneflow --dataset sceneflow \
        --loadmodel ./ckpt
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np

from ecm_tpu.cli.common import base_parser, eval_mesh, resolve_config
from ecm_tpu.data.pipeline import make_eval_iterator
from ecm_tpu.parallel.sharding import replicate, use_mesh
from ecm_tpu.train import checkpoint as ckpt_lib
from ecm_tpu.train.state import create_train_state
from ecm_tpu.train.steps import make_eval_step


def main(argv: list[str] | None = None) -> None:
    parser = base_parser("ECM-TPU evaluation (EPE / D1-all)")
    parser.add_argument(
        "--dataset",
        default="sceneflow",
        choices=["sceneflow", "kitti2015", "kitti2012", "middlebury"],
    )
    parser.add_argument("--limit", type=int, default=0, help="max pairs (0 = all)")
    args = parser.parse_args(argv)
    cfg = resolve_config(args, default_preset="kitti_infer")

    if args.dataset == "sceneflow":
        from ecm_tpu.data.sceneflow import list_sceneflow, load_sample

        _, specs = list_sceneflow(args.datapath)
    elif args.dataset == "middlebury":
        from ecm_tpu.data.middlebury import list_middlebury, load_sample

        specs, _ = list_middlebury(args.datapath)
    else:
        from ecm_tpu.data.kitti import list_kitti, load_sample

        year = 2015 if args.dataset.endswith("15") else 2012
        _, specs = list_kitti(args.datapath, year=year)
    if args.limit:
        specs = specs[: args.limit]
    if not specs:
        raise FileNotFoundError(f"no eval samples under {args.datapath!r}")

    model = cfg.model.build()
    state = create_train_state(model, jax.random.PRNGKey(0), (384, 1248, 3))
    if args.loadmodel:
        state, step0 = ckpt_lib.restore_latest(
            ckpt_lib.make_manager(args.loadmodel), state
        )
        print(f"loaded checkpoint step {step0}")
    eval_step = make_eval_step(model, cfg.model.max_disp)

    # BASELINE config 4: --mesh-disp N (or the middlebury_disp_sharded
    # preset) shards the cost volume's disparity axis across chips
    mesh = eval_mesh(cfg)
    if mesh is not None:
        print(f"disp-sharded eval mesh: {dict(zip(mesh.axis_names, mesh.devices.shape))}")

    all_m = []
    with use_mesh(mesh):
        for batch in make_eval_iterator(specs, load_sample, batch_size=1):
            jb = {k: jnp.asarray(v) for k, v in batch.items() if k != "pads"}
            if mesh is not None:
                jb = jax.device_put(jb, replicate(mesh))
            _, m = eval_step(state, jb)
            all_m.append({k: float(v) for k, v in m.items()})
    agg = {k: float(np.mean([m[k] for m in all_m])) for k in all_m[0] if k != "valid_px"}
    agg["num_pairs"] = len(all_m)
    print(json.dumps(agg))


if __name__ == "__main__":
    main()
