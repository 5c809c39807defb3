"""Flow field rendering: flow -> HSV -> BGR image.

NumPy-only reimplementation of the reference's cv2-based renderer
(utils/visualization.py:5-18); angle encodes hue, magnitude value.
"""
import numpy as np


def _hsv_to_bgr(h, s, v):
    """Vectorised HSV->BGR for uint8 images (h in [0,180) cv2 convention)."""
    h = h.astype(np.float32) * 2.0          # to degrees [0, 360)
    s = s.astype(np.float32) / 255.0
    v = v.astype(np.float32)
    c = v * s
    hp = h / 60.0
    x = c * (1 - np.abs(hp % 2 - 1))
    z = np.zeros_like(c)
    conds = [(0 <= hp) & (hp < 1), (1 <= hp) & (hp < 2),
             (2 <= hp) & (hp < 3), (3 <= hp) & (hp < 4),
             (4 <= hp) & (hp < 5), (5 <= hp)]
    rs = np.select(conds, [c, x, z, z, x, c])
    gs = np.select(conds, [x, c, c, x, z, z])
    bs = np.select(conds, [z, z, x, c, c, x])
    m = v - c
    bgr = np.stack([bs + m, gs + m, rs + m], axis=-1)
    return np.clip(bgr, 0, 255).astype(np.uint8)


def flow2img(flow_x, flow_y):
    """Render a flow field as a BGR uint8 image (hue=direction, val=mag)."""
    flows = np.stack((flow_x, flow_y), axis=2)
    mag = np.linalg.norm(flows, axis=2)

    ang = np.arctan2(flow_y, flow_x)
    ang += np.pi
    ang *= 180. / np.pi / 2.
    ang = ang.astype(np.uint8)
    # min-max normalisation of the magnitude (cv2.NORM_MINMAX semantics)
    mag_min, mag_max = mag.min(), mag.max()
    if mag_max > mag_min:
        val = (mag - mag_min) / (mag_max - mag_min) * 255.0
    else:
        val = np.zeros_like(mag)
    sat = np.full_like(ang, 255, dtype=np.uint8)
    return _hsv_to_bgr(ang, sat, val)
