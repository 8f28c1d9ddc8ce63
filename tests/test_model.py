"""Bicycle model tests: frame transforms, plant step, linearization,
localization — all against the float64 loop oracle."""

import numpy as np
import jax
import jax.numpy as jnp

from multi_purpose_mpc_tpu.models.bicycle import (
    drive,
    horizon_linearize,
    init_car_state,
    linearize,
    locate_waypoint,
    s2t,
    t2s,
)
from tests.oracle.geometry import (
    drive_oracle,
    linearize_oracle,
    s2t_oracle,
    t2s_oracle,
)


def test_linearize_matches_oracle(rng):
    for _ in range(20):
        v = rng.uniform(0.1, 2.0)
        k = rng.uniform(-2.0, 2.0)
        ds = rng.uniform(0.01, 0.2)
        f, A, B = linearize(v, k, ds)
        fo, Ao, Bo = linearize_oracle(v, k, ds)
        np.testing.assert_allclose(np.asarray(f), fo, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(A), Ao, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(B), Bo, rtol=1e-5, atol=1e-6)


def test_linearize_vectorizes_over_horizon():
    v = jnp.array([0.5, 1.0, 1.5])
    k = jnp.array([0.0, 0.5, -0.5])
    ds = jnp.array([0.05, 0.05, 0.06])
    f, A, B = linearize(v, k, ds)
    assert f.shape == (3, 3) and A.shape == (3, 3, 3) and B.shape == (3, 3, 2)
    f1, A1, B1 = linearize(v[1], k[1], ds[1])
    np.testing.assert_allclose(np.asarray(A[1]), np.asarray(A1), rtol=1e-6)


def test_frame_transforms_roundtrip(sim_track, rng):
    path = sim_track["path"]
    for _ in range(10):
        wp = int(rng.integers(0, path.n_wp))
        e_y = float(rng.uniform(-0.1, 0.1))
        e_psi = float(rng.uniform(-0.5, 0.5))
        x, y, psi = s2t(path, wp, e_y, e_psi)
        e_y2, e_psi2 = t2s(path, wp, x, y, psi)
        np.testing.assert_allclose(float(e_y2), e_y, atol=1e-5)
        np.testing.assert_allclose(float(e_psi2), e_psi, atol=1e-5)

        # against oracle
        wx, wy, wpsi = float(path.x[wp]), float(path.y[wp]), float(path.psi[wp])
        xo, yo, psio = s2t_oracle(wx, wy, wpsi, e_y, e_psi)
        np.testing.assert_allclose([float(x), float(y), float(psi)],
                                   [xo, yo, psio], atol=1e-5)
        eo_y, eo_psi = t2s_oracle(wx, wy, wpsi, xo, yo, psio)
        np.testing.assert_allclose([float(e_y2), float(e_psi2)],
                                   [eo_y, eo_psi], atol=1e-5)


def test_drive_matches_oracle(sim_track, rng):
    path = sim_track["path"]
    st = init_car_state(path, N=30)
    st = st.replace(e_y=jnp.float32(0.03), e_psi=jnp.float32(0.1))
    v, delta, L, Ts = 0.8, 0.2, 0.12, 0.05
    out = drive(st, path, v, delta, L, Ts)
    ox, oy, opsi, os_ = drive_oracle(
        float(st.x), float(st.y), float(st.psi), float(st.s),
        0.03, 0.1, float(path.kappa[0]), v, delta, L, Ts)
    np.testing.assert_allclose(
        [float(out.x), float(out.y), float(out.psi), float(out.s)],
        [ox, oy, opsi, os_], atol=1e-5)


def test_locate_waypoint_matches_searchsorted_semantics(sim_track):
    path = sim_track["path"]
    cum = np.asarray(path.cum_len, np.float64)
    for s in [0.0, 0.01, float(cum[5]) + 1e-4, float(cum[20]) - 1e-4,
              float(cum[-1]) * 0.5]:
        wp = int(locate_waypoint(path, jnp.float32(s)))
        # reference: first idx with cum > s, then closer of (idx, idx-1)
        nxt = int(np.searchsorted(cum > s, True))
        nxt = min(max(nxt, 1), len(cum) - 1)
        prv = nxt - 1
        exp = nxt if abs(s - cum[nxt]) < abs(s - cum[prv]) else prv
        assert wp == exp, (s, wp, exp)


def test_locate_waypoint_wraps_on_circular(sim_track):
    path = sim_track["path"]
    over = float(path.length) + 0.05
    wp = int(locate_waypoint(path, jnp.float32(over)))
    assert 0 <= wp < 5  # wrapped to path start


def test_horizon_linearize_gathers_consistently(sim_track):
    path = sim_track["path"].replace(v_ref=jnp.full_like(sim_track["path"].x, 0.5))
    N = 30
    f, A, B, v_ref, kappa_ref, delta_s, idx = horizon_linearize(path, jnp.int32(3), N)
    assert A.shape == (N, 3, 3)
    np.testing.assert_array_equal(np.asarray(idx), (3 + np.arange(N)) % path.n_wp)
    f0, A0, B0 = linearize(v_ref[4], kappa_ref[4], delta_s[4])
    np.testing.assert_allclose(np.asarray(A[4]), np.asarray(A0), rtol=1e-6)


def test_drive_vmaps_over_fleet(sim_track):
    path = sim_track["path"]
    B = 8
    st = jax.vmap(lambda i: init_car_state(path, N=30))(jnp.arange(B))
    v = jnp.full((B,), 0.5)
    delta = jnp.zeros((B,))
    out = jax.vmap(lambda s, vv, dd: drive(s, path, vv, dd, 0.12, 0.05))(st, v, delta)
    assert out.x.shape == (B,)
    np.testing.assert_allclose(np.asarray(out.s), np.full(B, 0.025), atol=1e-6)
