"""SceneFlow trainer (reference component T1, ``main.py`` — SURVEY.md 2.3/3.1).

Usage (reference-style flags kept):
    python -m ecm_tpu.cli.train --datapath /data/sceneflow --steps 20000 \
        --maxdisp 192 --savemodel ./ckpt
    python -m ecm_tpu.cli.train --config overfit_gate     # synthetic gate
"""

from __future__ import annotations

import jax

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
from ecm_tpu.train.steps import make_train_step


def main(argv: list[str] | None = None) -> None:
    args = base_parser("ECM-TPU SceneFlow training (reference main.py)").parse_args(
        argv
    )
    maybe_init_distributed(args)
    cfg = resolve_config(args, default_preset="sceneflow_single")

    model = cfg.model.build()
    tx = make_optimizer(cfg.train.lr, list(cfg.train.lr_drops) or None)
    state = create_train_state(
        model, jax.random.PRNGKey(cfg.data.seed), (*cfg.data.crop, 3), tx
    )
    mesh = make_mesh_from(cfg)
    if mesh is not None:
        state = jax.device_put(state, replicate(mesh))

    manager = ckpt_lib.make_manager(cfg.train.ckpt_dir)
    if args.loadmodel:
        load_mgr = ckpt_lib.make_manager(args.loadmodel)
        state, step0 = ckpt_lib.restore_latest(load_mgr, state)
        print(f"restored checkpoint at step {step0} from {args.loadmodel}")
    else:
        state, step0 = ckpt_lib.restore_latest(manager, state)
        if step0:
            print(f"auto-resumed from step {step0}")

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
    )
    print(f"done at step {int(state.step)}")


if __name__ == "__main__":
    main()
