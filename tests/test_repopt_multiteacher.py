"""RepOpt gradient masks and multi-teacher pseudo-label merging."""

import numpy as np
import jax
import jax.numpy as jnp

from efficientteacher_tpu.models.common import LinearAddBlock, RealVGGBlock
from efficientteacher_tpu.ssod.pseudo_label import create_pseudo_labels_multi
from efficientteacher_tpu.train.repopt import (
    apply_grad_masks,
    build_grad_masks,
    extract_scales,
)


def test_extract_scales_and_masks():
    la = LinearAddBlock(8, s=1)
    x = jnp.zeros((1, 8, 8, 8))
    lv = la.init(jax.random.PRNGKey(0), x, train=False)
    scales = extract_scales({"blk": lv["params"]})
    assert "blk" in scales and len(scales["blk"]) == 3  # identity present

    rv = RealVGGBlock(8, s=1)
    rvv = rv.init(jax.random.PRNGKey(1), x, train=False)
    params = {"blk": rvv["params"]}
    masks = build_grad_masks(params, scales)
    m = masks["blk"]["conv"]["kernel"]
    assert m.shape == (3, 3, 8, 8)
    # center taps include 1x1 + identity contributions
    assert (m[1, 1] >= m[0, 0]).all()
    assert m[1, 1, 0, 0] > m[1, 1, 0, 1]  # diagonal identity boost

    grads = jax.tree.map(lambda p: jnp.ones_like(p), params)
    mg = apply_grad_masks(grads, masks)
    np.testing.assert_allclose(
        np.asarray(mg["blk"]["conv"]["kernel"]), m, rtol=1e-6
    )
    # non-masked leaves pass through
    np.testing.assert_allclose(
        np.asarray(mg["blk"]["bn"]["scale"]), 1.0
    )


def test_multi_teacher_merge_and_remap():
    img, nc = 128, 4
    # main teacher: one box class 1; extra teacher (2 classes): one box that
    # maps class 0 -> main class 3, overlapping a different location
    def mk(boxes, nc_t, n=64):
        pred = np.zeros((1, n, 5 + nc_t), np.float32)
        pred[0, :, 0:2] = 200  # off-image ->low conf elsewhere
        pred[0, :, 2:4] = 10
        pred[0, :, 4] = 0.01
        for i, (cx, cy, w, h, conf, cls) in enumerate(boxes):
            pred[0, i, 0:4] = [cx, cy, w, h]
            pred[0, i, 4] = conf
            pred[0, i, 5 + cls] = 0.95
        return jnp.asarray(pred)

    main = mk([(40, 40, 30, 30, 0.9, 1)], nc)
    extra = mk([(90, 90, 24, 24, 0.8, 0),      # -> main class 3
                (40, 40, 30, 30, 0.7, 1)], 2)  # duplicate of main box -> NMS'd
    cmap = np.array([3, -1], np.int32)
    m_s = np.zeros((1, 13), np.float32)
    m_s[0, 1:10] = np.eye(3).reshape(-1)
    m_s[0, 10] = 1.0

    pl = create_pseudo_labels_multi(
        [main, extra], [None, cmap], jnp.asarray(m_s),
        img_size=img, nc=nc, conf_thres=0.3, iou_thres=0.5, max_pl=16,
    )
    labels = np.asarray(pl.labels)[0][np.asarray(pl.mask)[0]]
    classes = sorted(labels[:, 0].astype(int).tolist())
    assert classes == [1, 3], labels
    # the duplicate box from the extra teacher was suppressed class-agnostic
    assert len(labels) == 2
