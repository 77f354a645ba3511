"""KITTI fine-tuner (reference component T2, ``finetune.py`` — SURVEY.md
2.3/3.2): loads a SceneFlow checkpoint, trains on KITTI 2012/2015 crops with
the reference LR drop (1e-3 -> 1e-4 late), reports 3-px / D1-all on the val
split each eval.

    python -m ecm_tpu.cli.finetune --datapath /data/kitti2015 \
        --datatype 2015 --loadmodel ./ckpt_sceneflow --savemodel ./ckpt_kitti
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np

from ecm_tpu.cli.common import (
    base_parser,
    make_data_iter,
    make_mesh_from,
    maybe_init_distributed,
    resolve_config,
    steps_from_epochs,
)
from ecm_tpu.parallel.sharding import replicate
from ecm_tpu.train import checkpoint as ckpt_lib
from ecm_tpu.train.loop import train_loop
from ecm_tpu.train.state import create_train_state, make_optimizer
from ecm_tpu.train.steps import make_eval_step, make_train_step


def main(argv: list[str] | None = None) -> None:
    parser = base_parser("ECM-TPU KITTI fine-tune (reference finetune.py)")
    parser.add_argument("--datatype", default="2015", choices=["2012", "2015"])
    args = parser.parse_args(argv)
    maybe_init_distributed(args)
    cfg = resolve_config(args, default_preset="kitti_finetune")
    cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, dataset=f"kitti{args.datatype}")
    )

    model = cfg.model.build()
    tx = make_optimizer(cfg.train.lr, list(cfg.train.lr_drops) or None)
    state = create_train_state(
        model, jax.random.PRNGKey(cfg.data.seed), (*cfg.data.crop, 3), tx
    )
    mesh = make_mesh_from(cfg)
    if mesh is not None:
        state = jax.device_put(state, replicate(mesh))

    if args.loadmodel:  # SceneFlow-pretrained weights (reference --loadmodel)
        load_mgr = ckpt_lib.make_manager(args.loadmodel)
        loaded, step0 = ckpt_lib.restore_latest(load_mgr, state)
        # weights + BN stats only; fresh optimizer/step for the fine-tune
        state = state.replace(
            params=loaded.params, batch_stats=loaded.batch_stats
        )
        print(f"loaded pretrained weights (step {step0}) from {args.loadmodel}")

    manager = ckpt_lib.make_manager(cfg.train.ckpt_dir)

    # validation eval: 3-px error / D1-all on the held-out split
    from ecm_tpu.data.kitti import list_kitti, load_sample
    from ecm_tpu.data.pipeline import make_eval_iterator

    year = 2015 if args.datatype == "2015" else 2012
    _, val_specs = list_kitti(cfg.data.datapath, year=year)
    eval_step = make_eval_step(model, cfg.model.max_disp)

    def eval_fn(state, step):
        ms = []
        for batch in make_eval_iterator(val_specs, load_sample, batch_size=1):
            jb = {k: jax.numpy.asarray(v) for k, v in batch.items() if k != "pads"}
            _, m = eval_step(state, jb)
            ms.append({k: float(v) for k, v in m.items()})
        if not ms:
            return {}
        return {
            k: float(np.mean([m[k] for m in ms])) for k in ("epe", "d1_all", "px3")
        }

    data_iter, n_samples = make_data_iter(cfg)
    num_steps = steps_from_epochs(cfg, n_samples)
    train_step = make_train_step(model, cfg.model.max_disp)
    state = train_loop(
        state,
        train_step,
        data_iter,
        num_steps=num_steps,
        mesh=mesh,
        log_every=cfg.train.log_every,
        ckpt_manager=manager,
        ckpt_every=cfg.train.ckpt_every,
        metrics_path=f"{cfg.train.ckpt_dir}/metrics.jsonl",
        tensorboard_dir=args.tensorboard,
        eval_fn=eval_fn if val_specs else None,
        eval_every=cfg.train.eval_every or cfg.train.ckpt_every,
    )
    print(f"done at step {int(state.step)}")


if __name__ == "__main__":
    main()
