import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stpy_tpu.domains import BallSet, BorelSet, CandidateSet, HierarchicalBorelSets


def test_box_volume_and_center():
    S = BorelSet(2, [[0.0, 2.0], [-1.0, 1.0]])
    assert S.volume() == pytest.approx(4.0)
    assert np.allclose(S.center_point(), [1.0, 0.0])
    assert S.perimeter() == pytest.approx(8.0)


def test_box_legendre_quadrature_integrates_polynomials():
    S = BorelSet(2, [[0.0, 1.0], [0.0, 2.0]])
    w, x = S.return_legendre_discretization(8)
    # integral of x^2 * y over [0,1]x[0,2] = (1/3) * 2 = 2/3
    val = jnp.sum(w * x[:, 0] ** 2 * x[:, 1])
    assert val == pytest.approx(2.0 / 3.0, rel=1e-10)
    # weights sum to the volume
    assert jnp.sum(w) == pytest.approx(S.volume(), rel=1e-12)


def test_box_is_inside_and_containment():
    S = BorelSet(2, [[0.0, 1.0], [0.0, 1.0]])
    pts = jnp.array([[0.5, 0.5], [1.5, 0.5], [0.0, 0.0], [0.999, 0.999]])
    mask = S.is_inside(pts)
    assert mask.tolist() == [True, False, True, True]
    inner = BorelSet(2, [[0.2, 0.8], [0.1, 0.9]])
    assert S.inside(inner)
    assert not inner.inside(S)
    # jit-safe
    assert jax.jit(S.is_inside)(pts).tolist() == [True, False, True, True]


def test_box_uniform_sample_within_bounds():
    S = BorelSet(3, [[0.0, 1.0], [2.0, 3.0], [-1.0, 0.0]])
    x = S.uniform_sample(jax.random.PRNGKey(0), 256)
    assert x.shape == (256, 3)
    assert bool(jnp.all(S.is_inside(x)))


def test_ball_quadrature_area():
    B = BallSet(2, [0.5, 0.5], 0.3)
    w, pts = B.return_legendre_discretization(30)
    assert jnp.sum(w) == pytest.approx(np.pi * 0.3**2, rel=1e-3)
    assert bool(jnp.all(B.is_inside(pts)))
    # integrate f(x,y)=1 over ball == volume
    assert B.volume() == pytest.approx(np.pi * 0.09, rel=1e-12)


def test_ball_uniform_sample_and_membership():
    B = BallSet(2, [0.0, 0.0], 1.0)
    x = B.uniform_sample(jax.random.PRNGKey(1), 512)
    assert bool(jnp.all(B.is_inside(x)))
    # roughly uniform: mean radius^2 of uniform disk = 1/2
    r2 = jnp.mean(jnp.sum(x**2, axis=1))
    assert float(r2) == pytest.approx(0.5, abs=0.05)


def test_hierarchy_1d_and_2d():
    H = HierarchicalBorelSets(1, [[0.0, 1.0]], levels=3)
    leafs = H.get_sets_level(3)
    assert len(leafs) == 4
    assert sum(s.volume() for s in leafs) == pytest.approx(1.0)

    H2 = HierarchicalBorelSets(2, [[0.0, 1.0], [0.0, 1.0]], levels=3)
    leafs2 = H2.get_sets_level(3)
    assert len(leafs2) == 16
    assert sum(s.volume() for s in leafs2) == pytest.approx(1.0)
    assert len(H2.get_all_sets()) == 1 + 4 + 16


def test_candidate_set():
    C = CandidateSet(np.random.randn(10, 2))
    assert C.size() == 10
    assert C.get_points().shape == (10, 2)
