"""Shared CLI plumbing for the driver scripts (T1-T4): reference-style flags
(SURVEY.md section 5 — ``--maxdisp``, ``--model``, ``--datapath``,
``--loadmodel``, ``--savemodel``, ``--seed`` keep their reference names),
mesh/bootstrap setup, data-source resolution.
"""

from __future__ import annotations

import argparse
import dataclasses
import os

import jax

from ecm_tpu.configs import CONFIGS, ExperimentConfig

# persistent compile cache: full-model train-step compiles take minutes; the
# cache makes re-runs (resume, eval, bench) start in seconds
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("ECM_TPU_COMPILE_CACHE", "/tmp/ecm_tpu_jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def base_parser(description: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=description)
    p.add_argument("--config", default=None, help="named preset from ecm_tpu.configs")
    p.add_argument("--maxdisp", type=int, default=192)
    p.add_argument("--model", default="stackhourglass", choices=["stackhourglass", "basic"])
    p.add_argument("--datapath", default="")
    p.add_argument("--epochs", type=int, default=None, help="epochs (converted to steps)")
    p.add_argument("--steps", type=int, default=None, help="train steps (overrides epochs)")
    p.add_argument("--batch", type=int, default=None, help="global batch size")
    p.add_argument("--loadmodel", default=None, help="checkpoint dir to restore")
    p.add_argument("--savemodel", default="checkpoints", help="checkpoint dir")
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--no-bf16", action="store_true", help="compute in f32")
    p.add_argument("--pallas", action="store_true", help="use Pallas kernels")
    p.add_argument(
        "--regress-mode",
        default=None,
        choices=["auto", "fullres", "fused", "lowres"],
        help="disparity regression path (auto = fused Pallas on TPU eval)",
    )
    p.add_argument(
        "--agg-layout",
        default=None,
        choices=["auto", "standard", "grouped"],
        help="aggregation volume layout (auto = grouped on TPU)",
    )
    p.add_argument(
        "--agg-fused",
        default=None,
        choices=["off", "auto", "on"],
        help="standard-layout fused Pallas aggregation pairs (eval only)",
    )
    p.add_argument("--mesh-disp", type=int, default=None, help="disp-axis mesh size")
    p.add_argument("--multihost", action="store_true", help="jax.distributed.initialize()")
    p.add_argument(
        "--debug-nans",
        action="store_true",
        help="jax.debug_nans: fail fast on NaN (SURVEY.md section 5 sanitizers)",
    )
    p.add_argument("--tensorboard", default=None, help="TensorBoard logdir")
    return p


def resolve_config(args, default_preset: str) -> ExperimentConfig:
    cfg = CONFIGS[args.config or default_preset]
    model = dataclasses.replace(
        cfg.model,
        name=args.model,
        max_disp=args.maxdisp,
        bf16=cfg.model.bf16 and not args.no_bf16,
        use_pallas=args.pallas or cfg.model.use_pallas,
        regress_mode=args.regress_mode or cfg.model.regress_mode,
        agg_layout=args.agg_layout or cfg.model.agg_layout,
        agg_fused=args.agg_fused or cfg.model.agg_fused,
    )
    data = dataclasses.replace(
        cfg.data,
        datapath=args.datapath or cfg.data.datapath,
        global_batch=args.batch or cfg.data.global_batch,
        seed=args.seed,
    )
    train = cfg.train
    if args.steps is not None:
        train = dataclasses.replace(train, num_steps=args.steps)
    elif args.epochs is not None:
        # resolved to steps once the dataset is listed (train CLIs call
        # steps_from_epochs with the sample count make_data_iter returns)
        train = dataclasses.replace(train, epochs=args.epochs)
    if args.lr is not None:
        train = dataclasses.replace(train, lr=args.lr)
    if args.mesh_disp is not None:
        train = dataclasses.replace(train, mesh_disp=args.mesh_disp)
    train = dataclasses.replace(train, ckpt_dir=args.savemodel)
    return ExperimentConfig(model=model, data=data, train=train)


def maybe_init_distributed(args) -> None:
    if getattr(args, "multihost", False):
        jax.distributed.initialize()
    if getattr(args, "debug_nans", False):
        jax.config.update("jax_debug_nans", True)


def make_mesh_from(cfg: ExperimentConfig):
    from ecm_tpu.parallel.sharding import make_mesh

    n = len(jax.devices())
    disp = cfg.train.mesh_disp
    if n == 1 and disp <= 1:
        return None  # single device: skip mesh machinery entirely
    data = cfg.train.mesh_data
    if data is None:
        data = n // max(disp, 1)
    return make_mesh(data=data, disp=max(disp, 1))


def eval_mesh(cfg: ExperimentConfig):
    """Disparity-sharded eval mesh (BASELINE.json config 4, Middlebury
    high-res): a ``(data=1, disp=mesh_disp)`` mesh — eval runs batch-1, so
    the whole slice goes to the disparity axis; ``constrain_volume`` inside
    the forward shards the cost volume over it and GSPMD inserts the conv
    halos + two-pass soft-argmin reductions. Returns None when
    ``mesh_disp <= 1`` (single-device eval skips mesh machinery)."""
    disp = cfg.train.mesh_disp
    if disp <= 1:
        return None
    n = len(jax.devices())
    if n < disp:
        raise ValueError(f"--mesh-disp {disp} needs {disp} devices, have {n}")
    from ecm_tpu.parallel.sharding import make_mesh

    return make_mesh(data=1, disp=disp)


def make_data_iter(cfg: ExperimentConfig):
    """Resolve the train-data iterator for cfg.data.dataset.

    Returns ``(iterator, n_samples)``; ``n_samples`` is None for unbounded
    synthetic streams (used by ``steps_from_epochs``).
    """
    from ecm_tpu.data.pipeline import PipelineConfig, make_synthetic_pipeline

    pcfg = PipelineConfig(
        batch_size=cfg.data.global_batch,
        crop=cfg.data.crop,
        seed=cfg.data.seed,
        worker_count=cfg.data.workers,
    )
    ds = cfg.data.dataset
    if ds == "synthetic":
        h, w = cfg.data.crop
        it = make_synthetic_pipeline(
            dataclasses.replace(pcfg, worker_count=0),
            h=h,
            w=w,
            max_disp=min(cfg.model.max_disp * 0.8, 40.0),
            distinct=cfg.data.synthetic_distinct,
        )
        return it, None
    from ecm_tpu.data.pipeline import make_train_pipeline

    if ds == "sceneflow":
        from ecm_tpu.data.sceneflow import list_sceneflow, load_sample

        train, _ = list_sceneflow(cfg.data.datapath)
        if not train:
            raise FileNotFoundError(
                f"no SceneFlow samples under {cfg.data.datapath!r}"
            )
        return make_train_pipeline(train, load_sample, pcfg), len(train)
    if ds in ("kitti2015", "kitti2012"):
        from ecm_tpu.data.kitti import list_kitti, load_sample

        year = 2015 if ds.endswith("15") else 2012
        train, _ = list_kitti(cfg.data.datapath, year=year)
        if not train:
            raise FileNotFoundError(f"no KITTI samples under {cfg.data.datapath!r}")
        return make_train_pipeline(train, load_sample, pcfg), len(train)
    if ds == "middlebury":
        from ecm_tpu.data.middlebury import list_middlebury, load_sample

        train, _ = list_middlebury(cfg.data.datapath)
        if not train:
            raise FileNotFoundError(
                f"no Middlebury scenes under {cfg.data.datapath!r}"
            )
        return make_train_pipeline(train, load_sample, pcfg), len(train)
    raise ValueError(f"unknown dataset {ds!r}")


def steps_from_epochs(cfg: ExperimentConfig, n_samples: int | None) -> int:
    """Resolve the step budget: explicit ``num_steps`` unless ``--epochs`` was
    given, in which case steps = epochs * floor(dataset / global_batch)
    (the reference's epoch loop over a drop-last DataLoader, SURVEY.md 3.1)."""
    if cfg.train.epochs is None:
        return cfg.train.num_steps
    if n_samples is None:
        raise ValueError(
            "--epochs needs a finite dataset; synthetic streams are unbounded "
            "— use --steps instead"
        )
    steps_per_epoch = max(1, n_samples // cfg.data.global_batch)
    return cfg.train.epochs * steps_per_epoch
