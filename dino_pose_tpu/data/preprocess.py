"""Model-input image preprocessing (HF/timm processor semantics, no hub).

The reference resolves a processor per backbone family
(/root/reference/data_loader/data_loader.py:218-223): HF ``AutoImageProcessor``
for DINOv2 and a timm-transform wrapper for FastViT. Both reduce to the same
shape of pipeline — shortest-edge bicubic resize, centre crop, 1/255 rescale,
ImageNet normalise — differing only in sizes. We implement that pipeline
directly (PIL for the resample, numpy for the affine colour math) with the
published per-model constants baked in, so no hub access or cached
preprocessor_config.json is needed.

Constants:
- DINOv2 (facebook/dinov2-*): BitImageProcessor with shortest_edge=256,
  bicubic, centre-crop 224, ImageNet mean/std (published
  preprocessor_config.json for facebook/dinov2-small).
- FastViT (timm/fastvit_*.apple_in1k): timm data config input 256, crop_pct
  0.9 => resize shortest edge round(256/0.9)=284 bicubic, centre-crop 256,
  ImageNet mean/std (timm model card defaults, mirrored from
  /root/reference/data_loader/data_loader.py:248-289 TimmImageProcessor).

Note the reference quirk this preserves: the training pipeline crops images
to 224x224 during augmentation and then the processor *upscales to 256 and
centre-crops back to 224*, i.e. the network sees the central 87.5% of the
frame the heatmap targets live in. Reproduced bug-for-bug for trained-model
parity.
"""

from __future__ import annotations

import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


class ShortestEdgePreprocessor:
    """shortest-edge resize -> centre crop -> rescale -> normalise -> CHW."""

    def __init__(
        self,
        shortest_edge: int,
        crop: int,
        mean: np.ndarray = IMAGENET_MEAN,
        std: np.ndarray = IMAGENET_STD,
    ):
        self.shortest_edge = int(shortest_edge)
        self.crop = int(crop)
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)
        # HF-compatible attribute used by the augmentation chain and dataset
        # (reference reads image_processor.crop_size['width']).
        self.crop_size = {"width": self.crop, "height": self.crop}

    def resize_size(self, width: int, height: int) -> tuple[int, int]:
        short, long = (width, height) if width <= height else (height, width)
        new_short = self.shortest_edge
        new_long = int(new_short * long / short)
        return (new_short, new_long) if width <= height else (new_long, new_short)

    def _to_array(self, image) -> np.ndarray:
        from PIL import Image

        if not isinstance(image, Image.Image):
            image = Image.fromarray(np.asarray(image))
        if image.mode != "RGB":
            image = image.convert("RGB")
        new_w, new_h = self.resize_size(*image.size)
        image = image.resize((new_w, new_h), Image.BICUBIC)
        arr = np.asarray(image, np.float32)

        # Centre crop (pad with zeros if smaller, like HF center_crop).
        c, h, w = self.crop, arr.shape[0], arr.shape[1]
        top, left = (h - c) // 2, (w - c) // 2
        if top >= 0 and left >= 0:
            arr = arr[top : top + c, left : left + c]
        else:
            out = np.zeros((c, c, 3), np.float32)
            src_t, src_l = max(0, top), max(0, left)
            dst_t, dst_l = max(0, -top), max(0, -left)
            hh, ww = min(h, c), min(w, c)
            out[dst_t : dst_t + hh, dst_l : dst_l + ww] = arr[
                src_t : src_t + hh, src_l : src_l + ww
            ]
            arr = out

        arr = arr / np.float32(255.0)
        arr = (arr - self.mean) / self.std
        return np.transpose(arr, (2, 0, 1))  # CHW float32

    def __call__(self, images, return_tensors: str | None = None) -> dict:
        if not isinstance(images, (list, tuple)):
            images = [images]
        pixel_values = np.stack([self._to_array(im) for im in images])
        return {"pixel_values": pixel_values}


def create_preprocessor(model_name: str) -> ShortestEdgePreprocessor:
    """Processor for a resolved backbone name (mirrors data_loader.py:218-223)."""
    if model_name == "test/fastvit-tiny":  # test backbone runs at 128 input
        return ShortestEdgePreprocessor(round(128 / 0.9), 128)
    if model_name.startswith("timm/"):
        # timm eval transform: resize round(input/crop_pct), crop input.
        input_size, crop_pct = 256, 0.9
        return ShortestEdgePreprocessor(round(input_size / crop_pct), input_size)
    return ShortestEdgePreprocessor(256, 224)
