"""On-device splat renderer."""

import jax.numpy as jnp
import numpy as np

from sph_pie_tpu.render import splat


def test_splat_mass_conserved_in_window():
    pos = jnp.asarray([[0.25, 0.25], [0.75, 0.75], [0.5, 0.5]], jnp.float32)
    w = jnp.asarray([1.0, 2.0, 4.0], jnp.float32)
    act = jnp.ones(3, bool)
    img = splat.splat(pos, w, act, ((0, 1), (0, 1)), (64, 64))
    assert abs(float(img.sum()) - 7.0) < 1e-4  # bilinear weights sum to 1


def test_splat_position_maps_correctly():
    # particle near the top-left corner of the world window -> row 0-ish
    pos = jnp.asarray([[0.02, 0.98]], jnp.float32)
    img = np.asarray(
        splat.splat(pos, jnp.ones(1), jnp.ones(1, bool), ((0, 1), (0, 1)), (32, 32))
    )
    iy, ix = np.unravel_index(img.argmax(), img.shape)
    assert iy <= 1 and ix <= 1


def test_splat_ignores_inactive_and_out_of_window():
    pos = jnp.asarray([[0.5, 0.5], [5.0, 5.0], [0.6, 0.6]], jnp.float32)
    act = jnp.asarray([True, True, False])
    img = splat.splat(pos, jnp.ones(3), act, ((0, 1), (0, 1)), (16, 16))
    assert abs(float(img.sum()) - 1.0) < 1e-5


def test_render_u8_3d_projection():
    pos = jnp.asarray([[0.5, 0.5, 0.9], [0.5, 0.5, 0.1]], jnp.float32)
    f = splat.render_u8(
        pos, jnp.ones(2), jnp.ones(2, bool), ((0, 1), (0, 1)), (16, 16), axis=2
    )
    assert f.dtype == jnp.uint8
    assert int(np.asarray(f).max()) > 0


def test_frame_from_state():
    from sph_pie_tpu.scenes import dam_break_2d

    scene = dam_break_2d(n_target=256)
    frame = splat.frame_from_state(scene.state, scene.params, (64, 64))
    a = np.asarray(frame)
    # fluid block occupies lower-left: bottom rows lit, top rows dark
    assert a[48:, :32].sum() > 0
    assert a[:8, 40:].sum() == 0
