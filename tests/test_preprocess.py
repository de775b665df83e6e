"""Preprocessor parity vs transformers.BitImageProcessor (DINOv2's processor).

The processor is constructed locally with the published
facebook/dinov2-small preprocessor_config.json values — no hub access.
"""

import numpy as np
import pytest
from PIL import Image

from dino_pose_tpu.data.preprocess import ShortestEdgePreprocessor, create_preprocessor


def hf_processor():
    from transformers import BitImageProcessor
    from transformers.image_utils import PILImageResampling

    return BitImageProcessor(
        do_resize=True,
        size={"shortest_edge": 256},
        resample=PILImageResampling.BICUBIC,
        do_center_crop=True,
        crop_size={"height": 224, "width": 224},
        do_rescale=True,
        rescale_factor=1 / 255,
        do_normalize=True,
        image_mean=[0.485, 0.456, 0.406],
        image_std=[0.229, 0.224, 0.225],
        do_convert_rgb=True,
    )


@pytest.mark.parametrize("size", [(224, 224), (321, 480), (640, 360), (200, 200)])
def test_matches_bit_image_processor(size):
    rng = np.random.default_rng(hash(size) % 2**31)
    img = Image.fromarray(rng.integers(0, 256, (size[1], size[0], 3), dtype=np.uint8))
    want = hf_processor()(images=img, return_tensors="np")["pixel_values"][0]
    got = create_preprocessor("facebook/dinov2-small")(img)["pixel_values"][0]
    assert got.shape == want.shape == (3, 224, 224)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_timm_processor_shape():
    proc = create_preprocessor("timm/fastvit_t8.apple_in1k")
    assert proc.crop_size == {"width": 256, "height": 256}
    img = Image.fromarray(np.zeros((300, 400, 3), np.uint8))
    out = proc(img)["pixel_values"]
    assert out.shape == (1, 3, 256, 256)


def test_batch_and_array_inputs():
    proc = ShortestEdgePreprocessor(256, 224)
    imgs = [np.zeros((240, 250, 3), np.uint8), np.full((250, 240, 3), 255, np.uint8)]
    out = proc(imgs)["pixel_values"]
    assert out.shape == (2, 3, 224, 224)
    # pure black normalises to -mean/std
    np.testing.assert_allclose(
        out[0, :, 0, 0], -proc.mean / proc.std, rtol=1e-6
    )
