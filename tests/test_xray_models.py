"""Radon transform conformance + workload-recipe smoke/convergence tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from conformance import ConformanceSuite
from pyxu_tpu.operator.linop.xray import FourierRadon, RadonTransform
from pyxu_tpu.opt.stop import MaxIter, RelError


class TestRadon(ConformanceSuite):
    @pytest.fixture
    def op(self):
        angles = np.linspace(0, np.pi, 7, endpoint=False)
        return RadonTransform((12, 12), angles, n_det=16, n_samples=16)

    def test_point_source_sinogram(self):
        """A centered point source projects to a centered peak per angle."""
        angles = np.linspace(0, np.pi, 8, endpoint=False)
        op = RadonTransform((33, 33), angles, n_det=33, n_samples=48)
        img = jnp.zeros((33, 33)).at[16, 16].set(1.0)
        sino = np.asarray(op.apply(img))
        assert sino.shape == (8, 33)
        for a in range(8):
            assert abs(np.argmax(sino[a]) - 16) <= 1

    def test_mass_preserved(self):
        """Each projection integrates to (approximately) the image mass."""
        angles = np.linspace(0, np.pi, 5, endpoint=False)
        op = RadonTransform((24, 24), angles, n_det=40, n_samples=64)
        rng = np.random.default_rng(0)
        img = jnp.asarray(rng.random((24, 24)), jnp.float32)
        sino = np.asarray(op.apply(img))
        mass = float(jnp.sum(img))
        dt = float(op._t[1] - op._t[0])
        for a in range(5):
            assert abs(sino[a].sum() * dt - mass) / mass < 0.05


def test_lasso_workload_converges():
    from pyxu_tpu.models import lasso_deconvolution
    slv, kw, aux = lasso_deconvolution(shape=(64, 64), lam=0.005)
    slv.fit(stop_crit=RelError(eps=1e-7, var="x", rank=2) | MaxIter(1500),
            max_iter=1500, **kw)
    x = np.asarray(slv.solution())
    err = np.linalg.norm(x - aux["x_true"]) / np.linalg.norm(aux["x_true"])
    assert err < 0.6


def test_ct_workload_converges():
    from pyxu_tpu.models import sparse_view_ct
    slv, kw, aux = sparse_view_ct(shape=(48, 48), n_angles=24, lam=0.005)
    slv.fit(stop_crit=RelError(eps=1e-6, var="x", rank=2) | MaxIter(300),
            max_iter=300, **kw)
    x = np.asarray(slv.solution())
    assert np.all(x >= -1e-5)  # positivity enforced
    err = np.linalg.norm(x - aux["x_true"]) / np.linalg.norm(aux["x_true"])
    assert err < 0.4


def test_ri_workload_converges():
    # default real_sky=True: iterates are the real (H, W) sky image
    from pyxu_tpu.models import radio_interferometry
    slv, kw, aux = radio_interferometry(shape=(32, 32), n_vis=800, lam=0.02)
    slv.fit(stop_crit=RelError(eps=1e-6, var="x", rank=2) | MaxIter(200),
            max_iter=200, **kw)
    x = np.asarray(slv.solution())
    err = np.linalg.norm(x - aux["x_true"]) / np.linalg.norm(aux["x_true"])
    assert err < 0.5


def test_ri_workload_converges_complex():
    # legacy complex-image formulation: iterates are (H, W, 2) real views
    from pyxu_tpu.models import radio_interferometry
    slv, kw, aux = radio_interferometry(shape=(32, 32), n_vis=800, lam=0.02,
                                        real_sky=False)
    slv.fit(stop_crit=RelError(eps=1e-6, var="x", rank=3) | MaxIter(200),
            max_iter=200, **kw)
    x = np.asarray(slv.solution())[..., 0]
    err = np.linalg.norm(x - aux["x_true"]) / np.linalg.norm(aux["x_true"])
    assert err < 0.5


def test_consensus_workload_smoke():
    from pyxu_tpu.models import consensus_tiles
    slv, kw, aux = consensus_tiles(tile=(16, 16), n_tiles=8)
    slv.fit(stop_crit=RelError(eps=1e-6, var="z", rank=2) | MaxIter(300),
            max_iter=300, **kw)
    z = np.asarray(slv.solution())
    assert z.shape == (16, 16) and np.isfinite(z).all()


class TestFourierRadon(ConformanceSuite):
    @pytest.fixture
    def op(self):
        from pyxu_tpu.operator.linop.xray import FourierRadon
        angles = np.linspace(0, np.pi, 6, endpoint=False)
        return FourierRadon((12, 12), angles, n_det=16)


def test_fourier_radon_matches_definition():
    """Check against the brute-force Fourier-slice formula (exact modulo
    NUFFT eps)."""
    from pyxu_tpu.operator.linop.xray import FourierRadon
    rng = np.random.default_rng(3)
    H = W = 10
    n_det, A = 16, 5
    angles = np.linspace(0, np.pi, A, endpoint=False)
    img = rng.standard_normal((H, W))
    op = FourierRadon((H, W), angles, n_det=n_det, eps=1e-9)
    got = np.asarray(op.apply(jnp.asarray(img, jnp.float32)))
    # brute force
    q = np.fft.fftfreq(n_det) * 2 * np.pi
    ks = np.stack(np.meshgrid(np.arange(-(H // 2), (H + 1) // 2),
                              np.arange(-(W // 2), (W + 1) // 2),
                              indexing="ij"), -1).reshape(-1, 2)
    f = img.reshape(-1)
    ct = (n_det - 1) / 2.0
    want = np.empty((A, n_det))
    for a in range(A):
        d = np.array([np.cos(angles[a]), np.sin(angles[a])])
        phat = np.array([(f * np.exp(-1j * w * (ks @ d))).sum() for w in q])
        p = np.fft.ifft(phat * np.exp(-1j * q * ct))
        want[a] = p.real
    assert np.allclose(got, want, atol=1e-3)


def test_fourier_radon_point_source_and_mass():
    from pyxu_tpu.operator.linop.xray import FourierRadon
    H = W = 32
    angles = np.linspace(0, np.pi, 8, endpoint=False)
    op = FourierRadon((H, W), angles, n_det=64)
    img = jnp.zeros((H, W)).at[H // 2, W // 2].set(1.0)
    sino = np.asarray(op.apply(img))
    # peak near the detector center for every angle; mass preserved
    for a in range(8):
        assert abs(np.argmax(sino[a]) - 31.5) <= 1.0
        assert abs(sino[a].sum() - 1.0) < 1e-3


class TestFourierRadonGram:
    """R^T R via circulant Toeplitz(+Hankel Nyquist correction) kernels must
    match the synthesized composition across image/detector parities (see
    FourierRadon.gram derivation)."""

    @pytest.mark.parametrize("HW,nd,nang", [
        ((12, 12), 16, 7),    # even image, even detector (Nyquist Hankel)
        ((10, 14), 17, 5),    # odd detector: pure Toeplitz
        ((9, 11), 12, 4),     # odd image axes, even detector
        ((10, 11), 8, 6),     # mixed image parity
    ])
    def test_gram_matches_dense(self, HW, nd, nang):
        angles = np.linspace(0, np.pi, nang, endpoint=False)
        R = FourierRadon(HW, angles, n_det=nd, eps=1e-7)
        G = R.gram()
        Gm = np.asarray(G.asarray()).reshape(G.dim_size, G.dim_size)
        ref = np.asarray((R.T * R).asarray()).reshape(G.dim_size, G.dim_size)
        err = np.abs(Gm - ref).max() / np.abs(ref).max()
        assert err < 2e-4, err
        assert np.abs(Gm - Gm.T).max() / np.abs(ref).max() < 2e-4

    def test_quadratic_chain_and_batched(self):
        from pyxu_tpu.operator.func import SquaredL2Norm
        from pyxu_tpu.operator.linop.xray import _FourierRadonGram
        HW, nang = (12, 12), 9
        angles = np.linspace(0, np.pi, nang, endpoint=False)
        R = FourierRadon(HW, angles, eps=1e-6)
        rng = np.random.default_rng(1)
        y = R.apply(jnp.asarray(rng.random(HW, np.float32)))
        fq = 0.5 * SquaredL2Norm(R.codim_shape).asloss(y) * R
        Q, _, _ = fq._quad_spec()
        leaf = Q
        while hasattr(leaf, "_op"):
            leaf = leaf._op
        assert isinstance(leaf, _FourierRadonGram)
        xt = jnp.asarray(rng.random(HW, np.float32))
        g1 = np.asarray(fq.grad(xt))
        g2 = np.asarray(R.adjoint(R.apply(xt) - y))
        assert np.abs(g1 - g2).max() / np.abs(g2).max() < 1e-3
        # batched apply
        G = R.gram()
        xb = jnp.asarray(rng.random((3,) + HW, np.float32))
        out = np.asarray(G.apply(xb))
        assert out.shape == (3,) + HW
        assert np.abs(out[1] - np.asarray(G.apply(xb[1]))).max() < 1e-5
