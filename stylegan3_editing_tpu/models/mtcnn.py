"""MTCNN face detection + 5-point alignment (flax NHWC + numpy box utils).

Parity: reference models/setgan/encoder/mtcnn/ — P/R/O-Nets
(mtcnn/src/get_nets.py), box utilities (box_utils.py: nms, calibration,
square conversion), and the staged detector (detector.py / first_stage.py).
Used by the ID-similarity metric pipeline (calc_id_loss_parallel.py:18).
Weights convert from the released numpy files (pnet/rnet/onet .npy).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.image import max_pool2d


class _PReLU(nn.Module):
    @nn.compact
    def __call__(self, x):
        a = self.param("alpha", nn.initializers.constant(0.25),
                       (x.shape[-1],))
        return jnp.where(x >= 0, x, x * a.astype(x.dtype))


class PNet(nn.Module):
    """Proposal net: fully-convolutional; returns (offsets, probs) maps."""

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(10, (3, 3), padding="VALID", name="conv1")(x)
        x = _PReLU(name="prelu1")(x)
        x = max_pool2d(x, 2, 2)
        x = nn.Conv(16, (3, 3), padding="VALID", name="conv2")(x)
        x = _PReLU(name="prelu2")(x)
        x = nn.Conv(32, (3, 3), padding="VALID", name="conv3")(x)
        x = _PReLU(name="prelu3")(x)
        offsets = nn.Conv(4, (1, 1), name="conv4_2")(x)
        logits = nn.Conv(2, (1, 1), name="conv4_1")(x)
        return offsets, jax.nn.softmax(logits, axis=-1)


class RNet(nn.Module):
    """Refinement net on 24×24 crops → (offsets [N,4], probs [N,2])."""

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(28, (3, 3), padding="VALID", name="conv1")(x)
        x = _PReLU(name="prelu1")(x)
        x = max_pool2d(x, 3, 2, padding=1)
        x = nn.Conv(48, (3, 3), padding="VALID", name="conv2")(x)
        x = _PReLU(name="prelu2")(x)
        x = max_pool2d(x, 3, 2)
        x = nn.Conv(64, (2, 2), padding="VALID", name="conv3")(x)
        x = _PReLU(name="prelu3")(x)
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(x.shape[0], -1)
        x = nn.Dense(128, name="fc")(x)
        x = _PReLU(name="prelu4")(x)
        offsets = nn.Dense(4, name="fc_offsets")(x)
        logits = nn.Dense(2, name="fc_probs")(x)
        return offsets, jax.nn.softmax(logits, axis=-1)


class ONet(nn.Module):
    """Output net on 48×48 crops → (landmarks [N,10], offsets, probs)."""

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(32, (3, 3), padding="VALID", name="conv1")(x)
        x = _PReLU(name="prelu1")(x)
        x = max_pool2d(x, 3, 2, padding=1)
        x = nn.Conv(64, (3, 3), padding="VALID", name="conv2")(x)
        x = _PReLU(name="prelu2")(x)
        x = max_pool2d(x, 3, 2)
        x = nn.Conv(64, (3, 3), padding="VALID", name="conv3")(x)
        x = _PReLU(name="prelu3")(x)
        x = max_pool2d(x, 2, 2)
        x = nn.Conv(128, (2, 2), padding="VALID", name="conv4")(x)
        x = _PReLU(name="prelu4")(x)
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(x.shape[0], -1)
        x = nn.Dense(256, name="fc")(x)
        x = _PReLU(name="prelu5")(x)
        landmarks = nn.Dense(10, name="fc_landmarks")(x)
        offsets = nn.Dense(4, name="fc_offsets")(x)
        logits = nn.Dense(2, name="fc_probs")(x)
        return landmarks, offsets, jax.nn.softmax(logits, axis=-1)


# ------------------------------------------------------------- box utils

def nms(boxes: np.ndarray, overlap_threshold: float = 0.5,
        mode: str = "union") -> List[int]:
    """Greedy non-maximum suppression over [x1, y1, x2, y2, score] rows."""
    if len(boxes) == 0:
        return []
    x1, y1, x2, y2, score = boxes[:, 0], boxes[:, 1], boxes[:, 2], \
        boxes[:, 3], boxes[:, 4]
    area = (x2 - x1 + 1) * (y2 - y1 + 1)
    order = np.argsort(score)
    keep = []
    while len(order):
        i = order[-1]
        keep.append(int(i))
        rest = order[:-1]
        ix1 = np.maximum(x1[i], x1[rest])
        iy1 = np.maximum(y1[i], y1[rest])
        ix2 = np.minimum(x2[i], x2[rest])
        iy2 = np.minimum(y2[i], y2[rest])
        w = np.maximum(0.0, ix2 - ix1 + 1)
        h = np.maximum(0.0, iy2 - iy1 + 1)
        inter = w * h
        if mode == "min":
            overlap = inter / np.minimum(area[i], area[rest])
        else:
            overlap = inter / (area[i] + area[rest] - inter)
        order = rest[overlap <= overlap_threshold]
    return keep


def calibrate_box(boxes: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Apply regression offsets to boxes."""
    x1, y1, x2, y2 = (boxes[:, i] for i in range(4))
    w = (x2 - x1 + 1)[:, None]
    h = (y2 - y1 + 1)[:, None]
    translation = np.hstack([w, h, w, h]) * offsets
    out = boxes.copy()
    out[:, :4] = boxes[:, :4] + translation
    return out


def convert_to_square(boxes: np.ndarray) -> np.ndarray:
    """Expand boxes to squares around their centers."""
    out = boxes.copy()
    x1, y1, x2, y2 = (boxes[:, i] for i in range(4))
    h = y2 - y1 + 1
    w = x2 - x1 + 1
    side = np.maximum(h, w)
    out[:, 0] = x1 + w * 0.5 - side * 0.5
    out[:, 1] = y1 + h * 0.5 - side * 0.5
    out[:, 2] = out[:, 0] + side - 1
    out[:, 3] = out[:, 1] + side - 1
    return out


def generate_bboxes(probs: np.ndarray, offsets: np.ndarray, scale: float,
                    threshold: float) -> np.ndarray:
    """PNet output maps → candidate boxes at the original image scale."""
    stride, cell = 2, 12
    face_probs = probs[0, :, :, 1]
    ys, xs = np.where(face_probs > threshold)
    if len(ys) == 0:
        return np.zeros((0, 9))
    off = offsets[0, ys, xs, :]
    score = face_probs[ys, xs]
    boxes = np.vstack([
        np.round((stride * xs + 1.0) / scale),
        np.round((stride * ys + 1.0) / scale),
        np.round((stride * xs + 1.0 + cell) / scale),
        np.round((stride * ys + 1.0 + cell) / scale),
        score,
    ]).T
    return np.hstack([boxes, off])


class MTCNN:
    """Staged detector over converted P/R/O-Net variables."""

    def __init__(self, pnet_vars=None, rnet_vars=None, onet_vars=None,
                 rng: Optional[jax.Array] = None):
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        self.pnet, self.rnet, self.onet = PNet(), RNet(), ONet()
        self.pnet_vars = pnet_vars or self.pnet.init(
            rng, jnp.zeros((1, 12, 12, 3)))
        self.rnet_vars = rnet_vars or self.rnet.init(
            rng, jnp.zeros((1, 24, 24, 3)))
        self.onet_vars = onet_vars or self.onet.init(
            rng, jnp.zeros((1, 48, 48, 3)))

    @staticmethod
    def _preprocess(img: np.ndarray) -> np.ndarray:
        return (np.asarray(img, np.float32) - 127.5) * 0.0078125

    def _crop_boxes(self, img: np.ndarray, boxes: np.ndarray,
                    size: int) -> np.ndarray:
        from PIL import Image

        crops = []
        h, w = img.shape[:2]
        for box in convert_to_square(boxes):
            x1, y1, x2, y2 = [int(v) for v in box[:4]]
            x1c, y1c = max(x1, 0), max(y1, 0)
            x2c, y2c = min(x2, w - 1), min(y2, h - 1)
            patch = np.zeros((y2 - y1 + 1, x2 - x1 + 1, 3), np.uint8)
            if x2c >= x1c and y2c >= y1c:
                patch[y1c - y1:y2c - y1 + 1, x1c - x1:x2c - x1 + 1] = \
                    img[y1c:y2c + 1, x1c:x2c + 1]
            crop = np.asarray(Image.fromarray(patch).resize((size, size),
                                                            Image.BILINEAR))
            crops.append(self._preprocess(crop))
        return np.stack(crops)

    def detect(self, img: np.ndarray,
               min_face_size: float = 20.0,
               thresholds=(0.6, 0.7, 0.8),
               nms_thresholds=(0.7, 0.7, 0.7)
               ) -> Tuple[np.ndarray, np.ndarray]:
        """uint8 HWC image → (boxes [K, 5], landmarks [K, 10])."""
        from PIL import Image

        h, w = img.shape[:2]
        min_length = min(h, w)
        min_detection_size = 12
        factor = 0.707
        scales = []
        m = min_detection_size / min_face_size
        min_length *= m
        power = 0
        while min_length > min_detection_size:
            scales.append(m * factor ** power)
            min_length *= factor
            power += 1

        # Stage 1: PNet over the image pyramid.
        all_boxes = []
        for scale in scales:
            sw, sh = int(np.ceil(w * scale)), int(np.ceil(h * scale))
            scaled = np.asarray(Image.fromarray(img).resize(
                (sw, sh), Image.BILINEAR))
            x = jnp.asarray(self._preprocess(scaled))[None]
            offsets, probs = self.pnet.apply(self.pnet_vars, x)
            boxes = generate_bboxes(np.asarray(probs), np.asarray(offsets),
                                    scale, thresholds[0])
            if len(boxes):
                boxes = boxes[nms(boxes[:, :5], 0.5)]
                all_boxes.append(boxes)
        if not all_boxes:
            return np.zeros((0, 5)), np.zeros((0, 10))
        boxes = np.vstack(all_boxes)
        boxes = boxes[nms(boxes[:, :5], nms_thresholds[0])]
        boxes = calibrate_box(boxes[:, :5], boxes[:, 5:])

        # Stage 2: RNet.
        crops = self._crop_boxes(img, boxes, 24)
        offsets, probs = self.rnet.apply(self.rnet_vars, jnp.asarray(crops))
        probs, offsets = np.asarray(probs), np.asarray(offsets)
        keep = np.where(probs[:, 1] > thresholds[1])[0]
        boxes = boxes[keep]
        boxes[:, 4] = probs[keep, 1]
        offsets = offsets[keep]
        if len(boxes) == 0:
            return np.zeros((0, 5)), np.zeros((0, 10))
        keep = nms(boxes, nms_thresholds[1])
        boxes = calibrate_box(boxes[keep], offsets[keep])

        # Stage 3: ONet + landmarks.
        crops = self._crop_boxes(img, boxes, 48)
        landmarks, offsets, probs = self.onet.apply(self.onet_vars,
                                                    jnp.asarray(crops))
        landmarks, offsets, probs = (np.asarray(landmarks),
                                     np.asarray(offsets), np.asarray(probs))
        keep = np.where(probs[:, 1] > thresholds[2])[0]
        boxes = boxes[keep]
        boxes[:, 4] = probs[keep, 1]
        offsets, landmarks = offsets[keep], landmarks[keep]
        if len(boxes) == 0:
            return np.zeros((0, 5)), np.zeros((0, 10))
        # Landmarks to absolute coordinates.
        wbox = boxes[:, 2] - boxes[:, 0] + 1
        hbox = boxes[:, 3] - boxes[:, 1] + 1
        lm = landmarks.copy()
        lm[:, :5] = boxes[:, 0:1] + wbox[:, None] * landmarks[:, :5]
        lm[:, 5:] = boxes[:, 1:2] + hbox[:, None] * landmarks[:, 5:]
        boxes = calibrate_box(boxes, offsets)
        keep = nms(boxes, nms_thresholds[2], mode="min")
        return boxes[keep], lm[keep]
