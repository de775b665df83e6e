"""Fused on-device augmentation warp (the fast input path).

The reference (and our reference-exact host path) produces each training
image through a chain of PIL operations — crop, resize, rotate, flip,
resize+pad, crop, occlude — plus the HF processor's resize+crop+normalise:
seven sequential host resamples per sample
(/root/reference/data_loader/data_augmentation.py, data_loader.py:50-59).
On a host with few cores that chain, not the TPU, bounds training
throughput.

This module replaces all of it with ONE gather per output pixel, on device:

1. The host decodes the JPEG and letterboxes it once onto a fixed-size
   canvas (a single PIL resize — the only host resample left).
2. :func:`chain_affine` composes the whole geometric chain (including the
   processor's shortest-edge-256 -> center-crop-224 zoom) into a single
   2x3 affine ``A`` mapping model-input pixels to canvas pixels, plus the
   masks that PIL would have produced (pad colour in the letterbox margins,
   black outside the rotated source, occlusion rectangle).
3. :func:`warp_batch` (jit, vmap) bilinearly samples the canvas at the
   transformed coordinates, applies the masks, and normalises — producing
   the final (B, 3, S, S) float tensor directly on the accelerator.

Keypoint/z targets are untouched: they come from
:func:`dino_pose_tpu.data.augment.build_chain` (reference-exact) either way.
Pixels differ from the PIL chain at interpolation level (one resample
instead of seven); this path is therefore an opt-in speed mode
(``create_dataloaders(..., device_warp=True)``), not the parity default.
"""

from __future__ import annotations

import dataclasses
import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from dino_pose_tpu.data.augment import ChainSpec
from dino_pose_tpu.data.preprocess import IMAGENET_MEAN, IMAGENET_STD

CANVAS = 512  # fixed letterbox canvas size (host -> device transfer shape)


@dataclasses.dataclass
class WarpSpec:
    """Per-sample device-warp inputs (all fixed-shape numerics)."""

    affine: np.ndarray       # (2, 3): output (x, y, 1) -> canvas (x, y)
    pad_color: np.ndarray    # (3,) float32 0-255
    src_w: float             # valid canvas extent (letterboxed image size)
    src_h: float
    occ: np.ndarray          # (4,) x0, x1, y0, y1 in output pixels (or -1s)
    f3_affine: np.ndarray    # (2, 3): output -> F3 (resized, pre-pad) frame
    f2_affine: np.ndarray    # (2, 3): output -> F2 (rotation-source) frame
    frame: np.ndarray        # (3,) [scaled_w, scaled_h, rot_deg]


def _compose(*mats: np.ndarray) -> np.ndarray:
    out = np.eye(3)
    for m in mats:
        m3 = np.eye(3)
        m3[:2] = m
        out = out @ m3
    return out[:2]


def _translate(tx, ty):
    return np.array([[1, 0, tx], [0, 1, ty]], np.float64)


def _scale(sx, sy):
    return np.array([[sx, 0, 0], [0, sy, 0]], np.float64)


def chain_affine(
    spec: ChainSpec,
    image_size: tuple[int, int],
    canvas_scale: tuple[float, float],
    model_input: int,
    shortest_edge: int,
) -> WarpSpec:
    """Compose the inverse augmentation chain into one affine.

    Maps model-input pixel centres (after the processor's
    shortest-edge/center-crop zoom) back to canvas coordinates.
    """
    # Processor geometry on the out_size x out_size augmented image:
    # resize shortest edge -> shortest_edge, center crop model_input.
    proc_scale = spec.out_size / float(shortest_edge)
    crop_off = (shortest_edge - model_input) / 2.0

    # model pixel -> F5 (augmented image) coordinates
    to_f5 = _compose(
        _scale(proc_scale, proc_scale), _translate(crop_off, crop_off)
    )
    # F5 -> F4 (same frame; top-left crop) -> remove pad -> F3 (resized)
    to_f3 = _compose(
        _scale(1.0 / spec.resize_scale, 1.0 / spec.resize_scale),
        _translate(-spec.pad_x, -spec.pad_y),
    )
    # F3 -> unflip -> unrotate about centre -> F2
    mats = [to_f5, to_f3]
    if spec.flip:
        # PIL FLIP_LEFT_RIGHT mirrors pixel INDICES: x -> w - 1 - x in the
        # integer-centre convention warp_batch samples with (w - x would
        # shift every flipped image one pixel against the host chain).
        mats.append(
            np.array([[-1, 0, spec.scaled_w - 1], [0, 1, 0]], np.float64)
        )
    if spec.degrees:
        ang = math.radians(spec.degrees)
        ox, oy = spec.scaled_w / 2.0, spec.scaled_h / 2.0
        c, s = math.cos(ang), math.sin(ang)
        # PIL.Image.rotate(deg) samples output pixel q from input coordinate
        # R(+deg)(q - centre) + centre (verified empirically vs PIL); the
        # keypoint math applies the forward R(-deg), consistently.
        mats.append(
            _compose(
                _translate(ox, oy),
                np.array([[c, -s, 0], [s, c, 0]], np.float64),
                _translate(-ox, -oy),
            )
        )
    # Intermediate-frame affines for the mask geometry (both frames are
    # scaled_w x scaled_h): F3 = resized image before padding — model
    # pixels mapping outside it sit in the PIL pad margins; F2 = the
    # rotation SOURCE coordinate — PIL rotate fills black where it exits
    # the frame. The canvas-level bounds check cannot express either
    # (out-of-crop/rotated-away coordinates can still land on real image
    # content inside the canvas).
    f3_affine = _compose(*reversed(mats[:2]))
    f2_affine = _compose(*reversed(mats))

    # F2 -> unscale -> F1 -> un-crop -> F0 (original image)
    mats.append(_scale(spec.crop_w / max(spec.scaled_w, 1), spec.crop_h / max(spec.scaled_h, 1)))
    mats.append(_translate(spec.crop_x0, spec.crop_y0))
    # F0 -> canvas
    mats.append(_scale(canvas_scale[0], canvas_scale[1]))
    # Each entry of ``mats`` maps frame N -> N+1 in list order (to_f5 first,
    # canvas scale last); ``_compose`` applies its LAST argument first, so
    # the list must be reversed to compose in application order.
    affine = _compose(*reversed(mats))

    occ = np.full(4, -1.0, np.float32)
    if spec.occ_rect is not None:
        # Occlusion is drawn in the F5 frame; model pixel m sits at
        # f5 = proc_scale * (m + crop_off), so f5 -> m = f5 / s - crop_off.
        x0, x1, y0, y1 = spec.occ_rect
        occ = np.array(
            [
                x0 / proc_scale - crop_off,
                x1 / proc_scale - crop_off,
                y0 / proc_scale - crop_off,
                y1 / proc_scale - crop_off,
            ],
            np.float32,
        )

    w0, h0 = image_size
    pad_color = (
        np.asarray(spec.pad_color, np.float32)
        if (spec.pad_x or spec.pad_y)
        else np.full(3, -1.0, np.float32)  # sentinel: no padding applied
    )
    return WarpSpec(
        affine=affine.astype(np.float32),
        pad_color=pad_color,
        src_w=w0 * canvas_scale[0],
        src_h=h0 * canvas_scale[1],
        occ=occ,
        f3_affine=f3_affine.astype(np.float32),
        f2_affine=f2_affine.astype(np.float32),
        frame=np.array(
            [spec.scaled_w, spec.scaled_h, spec.degrees], np.float32
        ),
    )


def letterbox_canvas(image, canvas: int = CANVAS):
    """Host: one resize of a PIL image onto a (canvas, canvas) uint8 array.

    Returns (array, (sx, sy)) with original->canvas scale factors.
    """
    from PIL import Image

    w0, h0 = image.size
    scale = min(canvas / w0, canvas / h0, 1.0)
    nw, nh = max(1, int(round(w0 * scale))), max(1, int(round(h0 * scale)))
    resized = image.resize((nw, nh), Image.BILINEAR) if (nw, nh) != (w0, h0) else image
    out = np.zeros((canvas, canvas, 3), np.uint8)
    out[:nh, :nw] = np.asarray(resized, np.uint8)[..., :3]
    return out, (nw / w0, nh / h0)


@functools.partial(jax.jit, static_argnames=("model_input",))
def warp_batch(
    canvases,      # (B, C, C, 3) uint8
    affines,       # (B, 2, 3)
    pad_colors,    # (B, 3)
    src_wh,        # (B, 2) valid letterbox extent
    occs,          # (B, 4)
    f3_affines,    # (B, 2, 3) output -> F3 (resized, pre-pad) frame
    f2_affines,    # (B, 2, 3) output -> F2 (rotation-source) frame
    frames,        # (B, 3) [scaled_w, scaled_h, rot_deg]
    *,
    model_input: int = 224,
):
    """One fused gather + mask + normalise: returns (B, 3, S, S) float32."""
    S = model_input
    xs = jnp.arange(S, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, xs)  # gx: x coordinate, gy: y

    def apply_affine(aff):
        return (
            aff[0, 0] * gx + aff[0, 1] * gy + aff[0, 2],
            aff[1, 0] * gx + aff[1, 1] * gy + aff[1, 2],
        )

    def one(canvas, aff, pad_color, wh, occ, f3aff, f2aff, frame):
        cx, cy = apply_affine(aff)

        c = canvas.astype(jnp.float32)
        xi = jnp.clip(jnp.floor(cx).astype(jnp.int32), 0, CANVAS - 2)
        yi = jnp.clip(jnp.floor(cy).astype(jnp.int32), 0, CANVAS - 2)
        # Fractions from the CLIPPED corner: a coordinate of exactly
        # CANVAS-1 then weights the true pixel (fx=1) instead of repeating
        # column CANVAS-2. Out-of-range coordinates can extrapolate, but
        # every such pixel is masked below.
        fx = cx - xi.astype(jnp.float32)
        fy = cy - yi.astype(jnp.float32)

        def gather(yy, xx):
            return c[yy, xx]

        p00 = gather(yi, xi)
        p01 = gather(yi, xi + 1)
        p10 = gather(yi + 1, xi)
        p11 = gather(yi + 1, xi + 1)
        fx3 = fx[..., None]
        fy3 = fy[..., None]
        pix = (
            p00 * (1 - fx3) * (1 - fy3)
            + p01 * fx3 * (1 - fy3)
            + p10 * (1 - fx3) * fy3
            + p11 * fx3 * fy3
        )

        # outside the letterboxed source -> black
        inside = (
            (cx >= 0.0) & (cx <= wh[0] - 1.0) & (cy >= 0.0) & (cy <= wh[1] - 1.0)
        )
        pix = jnp.where(inside[..., None], pix, 0.0)

        # PIL parity masks in the frames where PIL actually paints them —
        # canvas-level bounds cannot express either, because out-of-crop or
        # rotated-away coordinates still land on real content in the canvas:
        # 1. rotate fills BLACK where the rotation-source coordinate exits
        #    the (scaled_w, scaled_h) frame (forward chain: rotate runs
        #    before padding, so this applies inside F3 only);
        # 2. resize+pad paints PAD COLOUR wherever the model pixel maps
        #    outside the resized image (the pad margins).
        fw, fh, rot = frame[0], frame[1], frame[2]
        f3x, f3y = apply_affine(f3aff)
        in_f3 = (f3x >= 0.0) & (f3x <= fw - 1.0) & (f3y >= 0.0) & (f3y <= fh - 1.0)
        f2x, f2y = apply_affine(f2aff)
        in_f2 = (f2x >= 0.0) & (f2x <= fw - 1.0) & (f2y >= 0.0) & (f2y <= fh - 1.0)
        rot_black = (rot != 0.0) & in_f3 & ~in_f2
        pix = jnp.where(rot_black[..., None], 0.0, pix)
        pad_used = jnp.all(pad_color >= 0.0)
        pix = jnp.where(
            (~in_f3[..., None]) & pad_used, pad_color[None, None, :], pix
        )

        # occlusion rectangle (model-pixel frame)
        occ_mask = (
            (gx >= occ[0]) & (gx < occ[1]) & (gy >= occ[2]) & (gy < occ[3])
        )
        pix = jnp.where(occ_mask[..., None], 0.0, pix)

        pix = pix / 255.0
        pix = (pix - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
        return jnp.transpose(pix, (2, 0, 1))

    return jax.vmap(one)(
        canvases, affines, pad_colors, src_wh, occs,
        f3_affines, f2_affines, frames,
    )
