"""TFRecord packing/reading for stereo samples (BASELINE.json:5 "DataLoader
-> host-sharded TFRecord/grain input pipeline").

For production multi-host training, decoding thousands of PNG/PFM files per
step on each host is the bottleneck (SURVEY.md 3.5); packing crops into
sharded TFRecords turns the input pipeline into sequential reads. TensorFlow
is used ONLY for record IO (it is baked into the image; no TF ops touch the
model path).

Record schema (all bytes features):
  left, right: float32 [H, W, 3] ImageNet-normalized, raw little-endian
  disparity:   float32 [H, W]
  shape:       int64 [2] (H, W)
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import numpy as np


def _tf():
    import tensorflow as tf

    tf.config.set_visible_devices([], "GPU")
    return tf


def write_shards(
    samples: Iterator[dict[str, np.ndarray]],
    out_dir: str,
    prefix: str = "stereo",
    samples_per_shard: int = 256,
) -> list[str]:
    """Pack samples into ``<out_dir>/<prefix>-NNNNN.tfrecord`` shards."""
    tf = _tf()
    os.makedirs(out_dir, exist_ok=True)
    paths, writer, count, shard = [], None, 0, 0
    try:
        for s in samples:
            if writer is None or count >= samples_per_shard:
                if writer is not None:
                    writer.close()
                path = os.path.join(out_dir, f"{prefix}-{shard:05d}.tfrecord")
                paths.append(path)
                writer = tf.io.TFRecordWriter(path)
                shard += 1
                count = 0
            h, w = s["disparity"].shape

            def b(a):
                return tf.train.Feature(
                    bytes_list=tf.train.BytesList(
                        value=[np.ascontiguousarray(a, np.float32).tobytes()]
                    )
                )

            ex = tf.train.Example(
                features=tf.train.Features(
                    feature={
                        "left": b(s["left"]),
                        "right": b(s["right"]),
                        "disparity": b(s["disparity"]),
                        "shape": tf.train.Feature(
                            int64_list=tf.train.Int64List(value=[h, w])
                        ),
                    }
                )
            )
            writer.write(ex.SerializeToString())
            count += 1
    finally:
        if writer is not None:
            writer.close()
    return paths


def read_shards(
    paths: list[str], shuffle: bool = False, seed: int = 0
) -> Iterator[dict[str, np.ndarray]]:
    """Stream samples back from TFRecord shards (numpy dicts)."""
    tf = _tf()
    ds = tf.data.TFRecordDataset(paths)
    if shuffle:
        ds = ds.shuffle(1024, seed=seed)
    spec = {
        "left": tf.io.FixedLenFeature([], tf.string),
        "right": tf.io.FixedLenFeature([], tf.string),
        "disparity": tf.io.FixedLenFeature([], tf.string),
        "shape": tf.io.FixedLenFeature([2], tf.int64),
    }
    for rec in ds:
        ex = tf.io.parse_single_example(rec, spec)
        h, w = (int(x) for x in ex["shape"].numpy())
        yield {
            "left": np.frombuffer(ex["left"].numpy(), np.float32).reshape(h, w, 3),
            "right": np.frombuffer(ex["right"].numpy(), np.float32).reshape(h, w, 3),
            "disparity": np.frombuffer(ex["disparity"].numpy(), np.float32).reshape(
                h, w
            ),
        }
