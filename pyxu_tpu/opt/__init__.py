from pyxu_tpu.opt import stop  # noqa: F401
