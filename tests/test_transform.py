"""Transform semantics tests (mirror tests/test_transforms.h coverage)."""

import numpy as np

from craytpu.scene import transform as tf


def test_identity_inverse():
    t = tf.Transform()
    np.testing.assert_array_equal(t.A, np.eye(4, dtype=np.float32))
    np.testing.assert_array_equal(t.Ainv, np.eye(4, dtype=np.float32))


def test_translate_inverse():
    t = tf.translate(3.0, -2.0, 5.0)
    p = np.array([1.0, 1.0, 1.0], np.float32)
    q = tf.transform_point(p, t.A)
    np.testing.assert_allclose(q, [4.0, -1.0, 6.0], rtol=1e-6)
    back = tf.transform_point(q, t.Ainv)
    np.testing.assert_allclose(back, p, rtol=1e-5, atol=1e-5)


def test_rotations():
    t = tf.rotate_x(tf.to_radians(90.0))
    q = tf.transform_point(np.array([0.0, 1.0, 0.0], np.float32), t.A)
    np.testing.assert_allclose(q, [0.0, 0.0, 1.0], atol=1e-6)
    t = tf.rotate_y(tf.to_radians(90.0))
    q = tf.transform_point(np.array([0.0, 0.0, 1.0], np.float32), t.A)
    np.testing.assert_allclose(q, [1.0, 0.0, 0.0], atol=1e-6)
    t = tf.rotate_z(tf.to_radians(90.0))
    q = tf.transform_point(np.array([1.0, 0.0, 0.0], np.float32), t.A)
    np.testing.assert_allclose(q, [0.0, 1.0, 0.0], atol=1e-6)


def test_scale_inverse_matches_numpy():
    t = tf.scale(2.0, 4.0, 8.0)
    np.testing.assert_allclose(t.Ainv, np.linalg.inv(t.A), rtol=1e-5)


def test_compose_order_translate_rotate_scale():
    """sceneloader.c:716-756: translates then rotates then scales, so a
    point is scaled first, then rotated, then translated."""
    comp = tf.compose([tf.scale_uniform(2.0), tf.translate(10.0, 0.0, 0.0),
                       tf.rotate_z(tf.to_radians(90.0))])
    p = np.array([1.0, 0.0, 0.0], np.float32)
    # scale: (2,0,0); rotZ90: (0,2,0); translate: (10,2,0)
    q = tf.transform_point(p, comp.A)
    np.testing.assert_allclose(q, [10.0, 2.0, 0.0], atol=1e-5)
    back = tf.transform_point(q, comp.Ainv)
    np.testing.assert_allclose(back, p, atol=1e-5)


def test_composite_inverse_consistency():
    comp = tf.compose([tf.translate(5, 6, 7), tf.rotate_x(0.3),
                       tf.rotate_y(-1.2), tf.scale(2, 2, 2)])
    np.testing.assert_allclose(comp.A @ comp.Ainv, np.eye(4), atol=1e-4)


def test_bbox_transform():
    t = tf.rotate_z(tf.to_radians(90.0))
    bmin, bmax = tf.transform_bbox(np.array([0, 0, 0], np.float32),
                                   np.array([2, 1, 1], np.float32), t.A)
    np.testing.assert_allclose(bmin, [-1, 0, 0], atol=1e-5)
    np.testing.assert_allclose(bmax, [0, 2, 1], atol=1e-5)
