"""Host-side PIL rasterizer — exact behavioral oracle for ops.maps.boxes_to_binary_map.

Reproduces /root/reference/src/utils/bb_to_img.py:5-21 semantics (PIL
ImageDraw.polygon fill, corner reorder [fl, fr, br, bl], px = m*10+400,
vertical flip) for parity tests and as a host fallback when no accelerator is
available. Kept separate from the device path so that nothing on the hot path
imports PIL.
"""
from __future__ import annotations

import numpy as np
from PIL import Image, ImageDraw


def boxes_to_binary_map_pil(boxes_m, size: int = 800):
    boxes = np.asarray(boxes_m, dtype=np.float64)
    data = np.zeros((size, size))
    img = Image.fromarray(data)
    draw = ImageDraw.Draw(img)
    for box in boxes:  # box: [2, 4], rows x/y, corners fl, fr, bl, br
        quad = np.stack([box[:, 0], box[:, 1], box[:, 3], box[:, 2]])  # fl, fr, br, bl
        quad = quad * 10 + 400
        draw.polygon(list(quad.flatten()), fill=1)
    out = np.asarray(img)
    return np.flip(out, 0).astype(np.float32)
