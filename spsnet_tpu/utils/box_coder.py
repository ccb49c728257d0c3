"""Box encode/decode (jit-friendly).

Parity targets in ``pcdet/utils/box_coder_utils.py``:
- ``ResidualCoder`` (:5) — anchor-based 7-dof residual coder.
- ``PointResidualCoder`` (:144) — point-based residual coder.
- ``PointResidual_BinOri_Coder`` (:224) — IA-SSD/SPSNet coder: 6 residuals
  (xyz normalized by class mean-size diagonal, log dims) + ``bin_size``-bin
  orientation classification + in-bin residual; ``code_size = 6 + 2*bins``.

All coders are stateless dataclass-like objects whose methods are pure jnp.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


class ResidualCoder:
    """Anchor-based residual coder (``box_coder_utils.py:5-68``)."""

    def __init__(self, code_size=7, encode_angle_by_sincos=False, **kwargs):
        self.code_size = code_size
        self.encode_angle_by_sincos = encode_angle_by_sincos
        if self.encode_angle_by_sincos:
            self.code_size += 1

    def encode(self, boxes, anchors):
        anchors = anchors.at[..., 3:6].set(jnp.clip(anchors[..., 3:6], 1e-5, None))
        boxes = boxes.at[..., 3:6].set(jnp.clip(boxes[..., 3:6], 1e-5, None))
        xa, ya, za, dxa, dya, dza, ra = jnp.split(anchors[..., :7], 7, axis=-1)
        xg, yg, zg, dxg, dyg, dzg, rg = jnp.split(boxes[..., :7], 7, axis=-1)
        cgs = [boxes[..., 7 + i:8 + i] for i in range(boxes.shape[-1] - 7)]
        cas = [anchors[..., 7 + i:8 + i] for i in range(anchors.shape[-1] - 7)]

        diagonal = jnp.sqrt(dxa ** 2 + dya ** 2)
        xt = (xg - xa) / diagonal
        yt = (yg - ya) / diagonal
        zt = (zg - za) / dza
        dxt = jnp.log(dxg / dxa)
        dyt = jnp.log(dyg / dya)
        dzt = jnp.log(dzg / dza)
        if self.encode_angle_by_sincos:
            rts = [jnp.cos(rg) - jnp.cos(ra), jnp.sin(rg) - jnp.sin(ra)]
        else:
            rts = [rg - ra]
        cts = [g - a for g, a in zip(cgs, cas)]
        return jnp.concatenate([xt, yt, zt, dxt, dyt, dzt, *rts, *cts], axis=-1)

    def decode(self, encodings, anchors):
        xa, ya, za, dxa, dya, dza, ra = jnp.split(anchors[..., :7], 7, axis=-1)
        if not self.encode_angle_by_sincos:
            xt, yt, zt, dxt, dyt, dzt, rt = jnp.split(encodings[..., :7], 7, axis=-1)
            rest = encodings[..., 7:]
        else:
            xt, yt, zt, dxt, dyt, dzt, cost, sint = jnp.split(encodings[..., :8], 8, axis=-1)
            rest = encodings[..., 8:]
        if rest.shape[-1] > anchors.shape[-1] - 7:
            # extra code dims (e.g. velocity) with plain 7-dim anchors: the
            # reference zero-pads anchors to the coder's raw dim
            # (anchor_head_template.py generate_anchors anchor_ndim branch)
            pad = rest.shape[-1] - (anchors.shape[-1] - 7)
            anchors = jnp.concatenate(
                [anchors, jnp.zeros(anchors.shape[:-1] + (pad,),
                                    anchors.dtype)], axis=-1)

        diagonal = jnp.sqrt(dxa ** 2 + dya ** 2)
        xg = xt * diagonal + xa
        yg = yt * diagonal + ya
        zg = zt * dza + za
        dxg = jnp.exp(dxt) * dxa
        dyg = jnp.exp(dyt) * dya
        dzg = jnp.exp(dzt) * dza
        if self.encode_angle_by_sincos:
            rg = jnp.arctan2(sint + jnp.sin(ra), cost + jnp.cos(ra))
        else:
            rg = rt + ra
        cts = [rest[..., i:i + 1] + anchors[..., 7 + i:8 + i]
               for i in range(rest.shape[-1])]
        return jnp.concatenate([xg, yg, zg, dxg, dyg, dzg, rg, *cts], axis=-1)


class PointResidualBinOriCoder:
    """IA-SSD's ``PointResidual_BinOri_Coder`` (``box_coder_utils.py:224-319``).

    Encoding layout: ``[xt, yt, zt, dxt, dyt, dzt, bin_id, bin_res]`` for
    targets; predictions carry ``6 + 2*bin_size`` channels (bin logits +
    per-bin residuals).
    """

    def __init__(self, use_mean_size=True, mean_size=None, angle_bin_num=12, **kwargs):
        self.bin_size = int(kwargs.get('bin_size', angle_bin_num))
        self.code_size = 6 + 2 * self.bin_size
        self.bin_inter = 2 * np.pi / self.bin_size
        self.use_mean_size = use_mean_size
        if self.use_mean_size:
            self.mean_size = np.asarray(mean_size, dtype=np.float32)
            assert self.mean_size.min() > 0

    def _anchor_size(self, classes):
        mean = jnp.asarray(self.mean_size)
        idx = jnp.clip(classes.astype(jnp.int32) - 1, 0, mean.shape[0] - 1)
        return mean[idx]

    def encode(self, gt_boxes, points, gt_classes=None):
        """gt_boxes (N, 7+), points (N, 3), gt_classes (N,) in [1, num_class]."""
        gt_boxes = gt_boxes.at[..., 3:6].set(jnp.clip(gt_boxes[..., 3:6], 1e-5, None))
        xg, yg, zg, dxg, dyg, dzg, rg = [gt_boxes[..., i] for i in range(7)]
        xa, ya, za = [points[..., i] for i in range(3)]
        if self.use_mean_size:
            anchor = self._anchor_size(gt_classes)
            dxa, dya, dza = anchor[..., 0], anchor[..., 1], anchor[..., 2]
            diagonal = jnp.sqrt(dxa ** 2 + dya ** 2)
            xt = (xg - xa) / diagonal
            yt = (yg - ya) / diagonal
            zt = (zg - za) / dza
            dxt = jnp.log(dxg / dxa)
            dyt = jnp.log(dyg / dya)
            dzt = jnp.log(dzg / dza)
        else:
            xt, yt, zt = xg - xa, yg - ya, zg - za
            dxt, dyt, dzt = jnp.log(dxg), jnp.log(dyg), jnp.log(dzg)

        rg = jnp.clip(rg, -np.pi + 1e-5, np.pi - 1e-5)
        bin_id = jnp.floor((rg + np.pi) / self.bin_inter)
        bin_res = ((rg + np.pi) - (bin_id * self.bin_inter + self.bin_inter / 2)) \
            / (self.bin_inter / 2)
        return jnp.stack([xt, yt, zt, dxt, dyt, dzt, bin_id, bin_res], axis=-1)

    def decode(self, box_encodings, points, pred_classes=None):
        """box_encodings (N, 6+2*bins) predictions -> (N, 7) boxes."""
        xt, yt, zt, dxt, dyt, dzt = [box_encodings[..., i] for i in range(6)]
        xa, ya, za = [points[..., i] for i in range(3)]
        if self.use_mean_size:
            anchor = self._anchor_size(pred_classes)
            dxa, dya, dza = anchor[..., 0], anchor[..., 1], anchor[..., 2]
            diagonal = jnp.sqrt(dxa ** 2 + dya ** 2)
            xg = xt * diagonal + xa
            yg = yt * diagonal + ya
            zg = zt * dza + za
            dxg = jnp.exp(dxt) * dxa
            dyg = jnp.exp(dyt) * dya
            dzg = jnp.exp(dzt) * dza
        else:
            xg, yg, zg = xt + xa, yt + ya, zt + za
            dxg = jnp.exp(dxt)
            dyg = jnp.exp(dyt)
            dzg = jnp.exp(dzt)

        bin_logits = box_encodings[..., 6:6 + self.bin_size]
        bin_res_all = box_encodings[..., 6 + self.bin_size:6 + 2 * self.bin_size]
        bin_id = jnp.argmax(bin_logits, axis=-1)
        bin_res = jnp.take_along_axis(bin_res_all, bin_id[..., None], axis=-1)[..., 0]
        rg = bin_id.astype(box_encodings.dtype) * self.bin_inter - np.pi \
            + self.bin_inter / 2 + bin_res * (self.bin_inter / 2)
        return jnp.stack([xg, yg, zg, dxg, dyg, dzg, rg], axis=-1)


class PointResidualCoder:
    """``PointResidualCoder`` (``box_coder_utils.py:144-221``): direct angle."""

    def __init__(self, code_size=8, use_mean_size=True, mean_size=None, **kwargs):
        self.code_size = code_size
        self.use_mean_size = use_mean_size
        if self.use_mean_size:
            self.mean_size = np.asarray(mean_size, dtype=np.float32)
            assert self.mean_size.min() > 0

    def _anchor_size(self, classes):
        mean = jnp.asarray(self.mean_size)
        idx = jnp.clip(classes.astype(jnp.int32) - 1, 0, mean.shape[0] - 1)
        return mean[idx]

    def encode(self, gt_boxes, points, gt_classes=None):
        gt_boxes = gt_boxes.at[..., 3:6].set(jnp.clip(gt_boxes[..., 3:6], 1e-5, None))
        xg, yg, zg, dxg, dyg, dzg, rg = [gt_boxes[..., i] for i in range(7)]
        extra = [gt_boxes[..., 7 + i] for i in range(gt_boxes.shape[-1] - 7)]
        xa, ya, za = [points[..., i] for i in range(3)]
        if self.use_mean_size:
            anchor = self._anchor_size(gt_classes)
            dxa, dya, dza = anchor[..., 0], anchor[..., 1], anchor[..., 2]
            diagonal = jnp.sqrt(dxa ** 2 + dya ** 2)
            xt = (xg - xa) / diagonal
            yt = (yg - ya) / diagonal
            zt = (zg - za) / dza
            dxt = jnp.log(dxg / dxa)
            dyt = jnp.log(dyg / dya)
            dzt = jnp.log(dzg / dza)
        else:
            xt, yt, zt = xg - xa, yg - ya, zg - za
            dxt, dyt, dzt = jnp.log(dxg), jnp.log(dyg), jnp.log(dzg)
        return jnp.stack(
            [xt, yt, zt, dxt, dyt, dzt, jnp.cos(rg), jnp.sin(rg), *extra], axis=-1)

    def decode(self, box_encodings, points, pred_classes=None):
        xt, yt, zt, dxt, dyt, dzt = [box_encodings[..., i] for i in range(6)]
        cost, sint = box_encodings[..., 6], box_encodings[..., 7]
        xa, ya, za = [points[..., i] for i in range(3)]
        if self.use_mean_size:
            anchor = self._anchor_size(pred_classes)
            dxa, dya, dza = anchor[..., 0], anchor[..., 1], anchor[..., 2]
            diagonal = jnp.sqrt(dxa ** 2 + dya ** 2)
            xg = xt * diagonal + xa
            yg = yt * diagonal + ya
            zg = zt * dza + za
            dxg = jnp.exp(dxt) * dxa
            dyg = jnp.exp(dyt) * dya
            dzg = jnp.exp(dzt) * dza
        else:
            xg, yg, zg = xt + xa, yt + ya, zt + za
            dxg, dyg, dzg = jnp.exp(dxt), jnp.exp(dyt), jnp.exp(dzt)
        rg = jnp.arctan2(sint, cost)
        return jnp.stack([xg, yg, zg, dxg, dyg, dzg, rg], axis=-1)


class PreviousResidualDecoder:
    """Legacy decode-only coder (``box_coder_utils.py:80-109``): residual
    decode with the (w, l, h) encoding order swapped relative to
    ``ResidualCoder`` — dxg comes from the L slot, dyg from the W slot."""

    def __init__(self, code_size=7, **kwargs):
        self.code_size = code_size

    @staticmethod
    def decode(box_encodings, anchors):
        xa, ya, za = anchors[..., 0], anchors[..., 1], anchors[..., 2]
        dxa, dya, dza = anchors[..., 3], anchors[..., 4], anchors[..., 5]
        ra = anchors[..., 6]
        xt, yt, zt = (box_encodings[..., 0], box_encodings[..., 1],
                      box_encodings[..., 2])
        wt, lt, ht = (box_encodings[..., 3], box_encodings[..., 4],
                      box_encodings[..., 5])
        rt = box_encodings[..., 6]
        diagonal = jnp.sqrt(dxa ** 2 + dya ** 2)
        out = jnp.stack([
            xt * diagonal + xa, yt * diagonal + ya, zt * dza + za,
            jnp.exp(lt) * dxa, jnp.exp(wt) * dya, jnp.exp(ht) * dza,
            rt + ra], axis=-1)
        if box_encodings.shape[-1] > 7:
            out = jnp.concatenate(
                [out, box_encodings[..., 7:] + anchors[..., 7:]], axis=-1)
        return out


class PreviousResidualRoIDecoder(PreviousResidualDecoder):
    """Same as ``PreviousResidualDecoder`` but rg = ra - rt
    (``box_coder_utils.py:112-141``)."""

    @staticmethod
    def decode(box_encodings, anchors):
        out = PreviousResidualDecoder.decode(box_encodings, anchors)
        rg = anchors[..., 6] - box_encodings[..., 6]
        return out.at[..., 6].set(rg)


class PointBinResidualCoder:
    """Bin-angle point coder with [0, 1]-normalized residuals and optional
    velocity channels (``box_coder_utils.py:322-460``). Differs from
    ``PointResidualBinOriCoder``: angles shift by half a bin before
    bucketing and the residual is divided by the bin width."""

    def __init__(self, use_mean_size=True, mean_size=None, angle_bin_num=12,
                 pred_velo=False, **kwargs):
        self.angle_bin_num = int(angle_bin_num)
        self.code_size = 6 + 2 * self.angle_bin_num + (2 if pred_velo else 0)
        self.pred_velo = bool(pred_velo)
        self.use_mean_size = bool(use_mean_size)
        if self.use_mean_size:
            self.mean_size = jnp.asarray(np.asarray(mean_size, np.float32))

    def encode_angle(self, angle):
        two_pi = 2.0 * np.pi
        per = two_pi / self.angle_bin_num
        angle = jnp.remainder(angle, two_pi)
        shifted = jnp.remainder(angle + per / 2.0, two_pi)
        cls_f = jnp.floor(shifted / per)
        onehot = jax.nn.one_hot(cls_f.astype(jnp.int32), self.angle_bin_num)
        res = (shifted - (cls_f * per + per / 2.0)) / per
        return onehot, onehot * res[..., None]

    def decode_angle(self, angle_cls, angle_res):
        per = 2.0 * np.pi / self.angle_bin_num
        cls_idx = jnp.argmax(angle_cls, axis=-1)
        res = jnp.take_along_axis(angle_res, cls_idx[..., None],
                                  axis=-1)[..., 0] * per
        return cls_idx.astype(angle_res.dtype) * per + res

    def _anchor_dims(self, classes, like):
        if self.use_mean_size:
            size = self.mean_size[jnp.clip(classes - 1, 0, None)]
            return size[..., 0], size[..., 1], size[..., 2]
        one = jnp.ones_like(like)
        return one, one, one

    def encode(self, gt_boxes, points, gt_classes=None):
        dxa, dya, dza = self._anchor_dims(gt_classes, gt_boxes[..., 0])
        dims = jnp.clip(gt_boxes[..., 3:6], 1e-5, None)
        if self.use_mean_size:
            diag = jnp.sqrt(dxa ** 2 + dya ** 2)
            xt = (gt_boxes[..., 0] - points[..., 0]) / diag
            yt = (gt_boxes[..., 1] - points[..., 1]) / diag
            zt = (gt_boxes[..., 2] - points[..., 2]) / dza
            dxt = jnp.log(dims[..., 0] / dxa)
            dyt = jnp.log(dims[..., 1] / dya)
            dzt = jnp.log(dims[..., 2] / dza)
        else:
            xt = gt_boxes[..., 0] - points[..., 0]
            yt = gt_boxes[..., 1] - points[..., 1]
            zt = gt_boxes[..., 2] - points[..., 2]
            dxt, dyt, dzt = (jnp.log(dims[..., i]) for i in range(3))
        cls_oh, res = self.encode_angle(gt_boxes[..., 6])
        parts = [jnp.stack([xt, yt, zt, dxt, dyt, dzt], axis=-1), cls_oh, res]
        if gt_boxes.shape[-1] > 7:
            parts.append(gt_boxes[..., 7:])
        return jnp.concatenate(parts, axis=-1)

    def decode(self, box_encodings, points, pred_classes=None):
        A = self.angle_bin_num
        off = box_encodings[..., :6]
        dxa, dya, dza = self._anchor_dims(pred_classes, off[..., 0])
        if self.use_mean_size:
            diag = jnp.sqrt(dxa ** 2 + dya ** 2)
            xg = off[..., 0] * diag + points[..., 0]
            yg = off[..., 1] * diag + points[..., 1]
            zg = off[..., 2] * dza + points[..., 2]
            dxg = jnp.exp(off[..., 3]) * dxa
            dyg = jnp.exp(off[..., 4]) * dya
            dzg = jnp.exp(off[..., 5]) * dza
        else:
            xg = off[..., 0] + points[..., 0]
            yg = off[..., 1] + points[..., 1]
            zg = off[..., 2] + points[..., 2]
            dxg, dyg, dzg = (jnp.exp(off[..., 3 + i]) for i in range(3))
        rg = self.decode_angle(box_encodings[..., 6:6 + A],
                               box_encodings[..., 6 + A:6 + 2 * A])
        out = jnp.stack([xg, yg, zg, dxg, dyg, dzg, rg], axis=-1)
        if box_encodings.shape[-1] > 6 + 2 * A:
            out = jnp.concatenate([out, box_encodings[..., 6 + 2 * A:]],
                                  axis=-1)
        return out


_CODERS = {
    'ResidualCoder': ResidualCoder,
    'PointResidualCoder': PointResidualCoder,
    'PointResidual_BinOri_Coder': PointResidualBinOriCoder,
    'PointResidualBinOriCoder': PointResidualBinOriCoder,
    'PreviousResidualDecoder': PreviousResidualDecoder,
    'PreviousResidualRoIDecoder': PreviousResidualRoIDecoder,
    'PointBinResidualCoder': PointBinResidualCoder,
}


def build_box_coder(name, **kwargs):
    return _CODERS[name](**kwargs)
