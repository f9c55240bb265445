"""Smoke tests: every example script runs end-to-end at reduced size
(reference: doc/examples + primer/tomo notebooks are its executable docs)."""

import importlib.util
import pathlib
import sys

import pytest

_EX = pathlib.Path(__file__).parent.parent / "examples"


def _load(name):
    spec = importlib.util.spec_from_file_location(name, _EX / f"{name}.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def test_deconvolution_example():
    mod = _load("deconvolution")
    mod.main(n=48)


def test_tomography_example():
    mod = _load("tomography")
    x = mod.main(n=32, n_angles=12)
    assert x.shape == (32, 32) and float(x.min()) >= -1e-6  # positivity


def test_radio_interferometry_example():
    mod = _load("radio_interferometry")
    x = mod.main(n=24, n_vis=400)
    assert x.shape == (24, 24)


def test_distributed_example():
    import jax
    if len(jax.devices()) < 2:
        pytest.skip("needs the multi-device conftest mesh")
    mod = _load("distributed")
    # exercise the three patterns at reduced sizes
    from pyxu_tpu.parallel import auto_mesh
    mesh = auto_mesh()
    mod.tv_deconvolution_halo(mesh, n=48)
    mod.consensus_lasso(mesh, n=16)
    mod.sharded_type3_nufft(mesh, M=600, K=400)


def test_out_of_core_example():
    mod = _load("out_of_core")
    mod.main(H=96, W=40, block_rows=32)


def test_notebook_cells_execute():
    """The Jupyter walkthrough's code cells run top-to-bottom (no jupyter
    needed: exec the parsed cells — reference ships Stencils.ipynb /
    DifferentialOperators.ipynb as executable docs)."""
    import json
    import pathlib
    nb = json.loads((pathlib.Path(__file__).parent.parent / "examples" /
                     "tv_deconvolution.ipynb").read_text())
    ns = {}
    for cell in nb["cells"]:
        if cell["cell_type"] != "code":
            continue
        src = "".join(cell["source"])
        # keep the smoke test fast: shrink the problem + iteration budget
        src = src.replace("n, lam, sigma_blur = 256,", "n, lam, sigma_blur = 64,")
        src = src.replace("MaxIter(400)", "MaxIter(40)").replace(
            "max_iter=400", "max_iter=40")
        exec(src, ns)
    assert ns["err"] < 0.5
