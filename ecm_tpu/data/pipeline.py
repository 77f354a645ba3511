"""Host-sharded grain input pipeline (replaces the reference's
``torch.utils.data.DataLoader`` worker-process stack — SURVEY.md 3.5;
BASELINE.json:5 "DataLoader -> host-sharded TFRecord/grain input pipeline").

Design: a ``grain.MapDataset`` over path-triple (or synthetic) sources,
sharded **per host** (``jax.process_index()``/``process_count()``) so each
host only reads its slice of the global batch (BASELINE configs 3 & 5),
with worker-process prefetch overlapping host IO with the device step.

Every source yields dicts of numpy arrays: ``left``/``right``
``[H, W, 3] float32`` (ImageNet-normalized) and ``disparity [H, W] float32``.
"""

from __future__ import annotations

import dataclasses
from collections.abc import Iterator

import grain
import jax
import numpy as np


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    batch_size: int  # GLOBAL batch size (split across hosts)
    crop: tuple[int, int] | None = (256, 512)  # (H, W); None = eval/full
    shuffle: bool = True
    seed: int = 0
    num_epochs: int | None = None  # None = repeat forever
    worker_count: int = 0  # grain worker processes (0 = in-process)


def _host_slice(n_global: int) -> tuple[int, int]:
    """(host_batch, shard_index) for this process."""
    pc, pi = jax.process_count(), jax.process_index()
    assert n_global % pc == 0, f"global batch {n_global} not divisible by {pc} hosts"
    return n_global // pc, pi


def make_train_pipeline(
    specs: list,
    load_fn,
    cfg: PipelineConfig,
) -> Iterator[dict[str, np.ndarray]]:
    """Training iterator: shuffled, host-sharded, random-cropped, batched.

    Args:
      specs: list of SampleSpec path triples.
      load_fn: ``(spec, crop, rng) -> dict`` (sceneflow.load_sample or
        kitti.load_sample).
      cfg: pipeline config (``cfg.batch_size`` is GLOBAL).
    """
    host_bs, shard = _host_slice(cfg.batch_size)

    ds = grain.MapDataset.source(specs)
    if cfg.shuffle:
        ds = ds.shuffle(seed=cfg.seed)
    ds = ds[shard :: jax.process_count()]  # per-host shard
    if cfg.num_epochs is None:
        ds = ds.repeat(None)
    elif cfg.num_epochs > 1:
        ds = ds.repeat(cfg.num_epochs)

    def _load(i: int, spec):
        rng = np.random.default_rng((cfg.seed, shard, i))
        return load_fn(spec, crop=cfg.crop, rng=rng)

    ds = ds.map_with_index(_load)
    ds = ds.batch(host_bs, drop_remainder=True)
    it = ds.to_iter_dataset(
        read_options=grain.ReadOptions(num_threads=max(1, cfg.worker_count), prefetch_buffer_size=4)
    )
    if cfg.worker_count > 0:
        it = it.mp_prefetch(
            grain.MultiprocessingOptions(num_workers=cfg.worker_count)
        )
    return iter(it)


def make_eval_iterator(
    specs: list, load_fn, batch_size: int = 1, pad_multiple: int = 16
) -> Iterator[dict[str, np.ndarray]]:
    """Simple sequential eval iterator (full images, no shuffle, this host
    reads everything — eval is cheap and runs on host 0).

    Full images are padded (top/right, zeros) to a multiple of
    ``pad_multiple`` — the flagship model's stride-16 contract (features /4,
    then two stride-2 hourglass levels). SceneFlow frames are 540x960 and
    would otherwise crash the hourglass skip-adds. Zero-padded disparity is
    masked out of every metric automatically (``valid_mask``: gt > 0); the
    per-sample ``pads`` entry lets callers unpad predictions.
    """
    from ecm_tpu.data.preprocess import pad_to_multiple

    batch: list[dict] = []
    for spec in specs:
        sample = dict(load_fn(spec, crop=None))
        if pad_multiple > 1:
            pads = (0, 0)
            for key in ("left", "right", "disparity"):
                if key in sample:
                    sample[key], pads = pad_to_multiple(sample[key], pad_multiple)
            sample["pads"] = np.asarray(pads, dtype=np.int32)
        batch.append(sample)
        if len(batch) == batch_size:
            yield {k: np.stack([b[k] for b in batch]) for k in batch[0]}
            batch = []
    if batch:
        yield {k: np.stack([b[k] for b in batch]) for k in batch[0]}


def make_synthetic_pipeline(
    cfg: PipelineConfig,
    h: int = 256,
    w: int = 512,
    max_disp: float = 40.0,
    distinct: int | None = None,
) -> Iterator[dict[str, np.ndarray]]:
    """Synthetic stream with the same interface (overfit gate / benchmarks).

    ``distinct`` bounds the number of DISTINCT batches: the stream cycles
    through that many fixed batches forever — a true tiny-overfit set
    (``None`` = a fresh batch every step, i.e. learning the task rather than
    memorizing; the overfit GATE needs the former)."""
    from ecm_tpu.data.synthetic import make_batch

    host_bs, shard = _host_slice(cfg.batch_size)
    step = 0
    while True:
        s = step if distinct is None else step % distinct
        yield make_batch(
            (cfg.seed, shard, s).__hash__() & 0x7FFFFFFF, host_bs, h, w, max_disp
        )
        step += 1
