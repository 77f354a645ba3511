"""Single-pair demo (reference component T4, ``test_img.py`` — SURVEY.md
2.3): run one stereo pair (from files, or synthetic with --synthetic), save
the disparity as a 16-bit PNG + a colormapped visualization.

    python -m ecm_tpu.cli.test_img --left l.png --right r.png --out disp.png
    python -m ecm_tpu.cli.test_img --synthetic --out disp.png
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ecm_tpu.cli.common import base_parser, resolve_config
from ecm_tpu.data.kitti import save_disp_png
from ecm_tpu.data.preprocess import normalize, pad_to_multiple, unpad
from ecm_tpu.train import checkpoint as ckpt_lib
from ecm_tpu.train.state import create_train_state
from ecm_tpu.train.steps import make_infer_fn


def colormap_png(path: str, disp: np.ndarray) -> None:
    """Turbo-ish colormapped disparity visualization via PIL."""
    from PIL import Image

    d = disp / max(float(disp.max()), 1e-6)
    r = np.clip(1.5 - np.abs(2.0 * d - 1.5), 0, 1)
    g = np.clip(1.5 - np.abs(2.0 * d - 1.0), 0, 1)
    b = np.clip(1.5 - np.abs(2.0 * d - 0.5), 0, 1)
    rgb = (np.stack([r, g, b], -1) * 255).astype(np.uint8)
    Image.fromarray(rgb).save(path)


def main(argv: list[str] | None = None) -> None:
    parser = base_parser("ECM-TPU single-pair demo (reference test_img.py)")
    parser.add_argument("--left", default=None)
    parser.add_argument("--right", default=None)
    parser.add_argument("--out", default="disp.png")
    parser.add_argument("--synthetic", action="store_true")
    args = parser.parse_args(argv)
    cfg = resolve_config(args, default_preset="kitti_infer")

    if args.synthetic:
        from ecm_tpu.data.synthetic import make_pair

        s = make_pair(np.random.default_rng(0), h=256, w=512, max_disp=40.0)
        left_n, right_n, gt = s["left"], s["right"], s["disparity"]
        pads = (0, 0)
    else:
        from PIL import Image

        assert args.left and args.right, "--left/--right or --synthetic required"
        left = np.asarray(Image.open(args.left).convert("RGB"))
        right = np.asarray(Image.open(args.right).convert("RGB"))
        left_n, pads = pad_to_multiple(normalize(left), multiple=16)
        right_n, _ = pad_to_multiple(normalize(right), multiple=16)
        gt = None

    model = cfg.model.build()
    state = create_train_state(
        model, jax.random.PRNGKey(0), (left_n.shape[0], left_n.shape[1], 3)
    )
    if args.loadmodel:
        state, step0 = ckpt_lib.restore_latest(
            ckpt_lib.make_manager(args.loadmodel), state
        )
        print(f"loaded checkpoint step {step0}")
    infer = make_infer_fn(
        model, {"params": state.params, "batch_stats": state.batch_stats}
    )
    disp = jax.device_get(infer(jnp.asarray(left_n)[None], jnp.asarray(right_n)[None]))[0]
    disp = unpad(disp, pads)
    save_disp_png(args.out, disp)
    colormap_png(args.out.replace(".png", "_vis.png"), disp)
    msg = f"wrote {args.out}: range [{disp.min():.2f}, {disp.max():.2f}]"
    if gt is not None:
        valid = gt > 0
        msg += f", EPE vs synthetic GT: {np.abs(disp - gt)[valid].mean():.3f} px"
    print(msg)


if __name__ == "__main__":
    main()
