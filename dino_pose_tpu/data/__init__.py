"""Data pipeline: COCO parsing, on-device augmentation + target synthesis."""
