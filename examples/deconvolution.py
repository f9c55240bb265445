"""TV-regularized deconvolution, end to end (docs/primer.md as a script).

Run: JAX_PLATFORMS=cpu python examples/deconvolution.py  (or on TPU, unset)
"""

import numpy as np
import jax.numpy as jnp

from pyxu_tpu.operator import Gradient, L21Norm, SquaredL2Norm, Stencil
from pyxu_tpu.opt.solver import CondatVu
from pyxu_tpu.opt.stop import MaxIter, RelError
from pyxu_tpu.utils.misc import peaks


def main(n=256, lam=0.005, sigma_blur=2.0):
    # ground truth + blurred observation
    g = np.linspace(-2.5, 2.5, n)
    xx, yy = np.meshgrid(g, g, indexing="ij")
    x_true = jnp.asarray(np.asarray(peaks(jnp.asarray(xx), jnp.asarray(yy))),
                         jnp.float32)
    k = np.exp(-0.5 * ((np.arange(9) - 4) / sigma_blur) ** 2)
    k1 = jnp.asarray(k / k.sum(), jnp.float32)
    K = Stencil((n, n), [k1, k1], [4, 4], mode="symmetric")
    y = K.apply(x_true) + 0.01 * jnp.asarray(
        np.random.default_rng(0).standard_normal((n, n)), jnp.float32)

    # min 0.5||Kx - y||^2 + lam ||grad x||_{2,1}
    f = 0.5 * SquaredL2Norm((n, n)).asloss(y) * K
    D = Gradient((n, n), mode="symmetric")
    h = lam * L21Norm((2, n, n), l2_axis=0)

    solver = CondatVu(f=f, h=h, K=D)
    solver.fit(x0=y, stop_crit=RelError(eps=1e-5, var="x", rank=2) | MaxIter(500),
               max_iter=500)
    x_hat = solver.solution()

    err_blur = float(jnp.linalg.norm(y - x_true) / jnp.linalg.norm(x_true))
    err_rec = float(jnp.linalg.norm(x_hat - x_true) / jnp.linalg.norm(x_true))
    print(f"relative error: blurred {err_blur:.4f} -> reconstructed {err_rec:.4f}")
    return x_hat


if __name__ == "__main__":
    main()
