from pyxu_tpu.utils.complex import (  # noqa: F401
    complex_dtype,
    real_dtype,
    view_as_complex,
    view_as_complex_mat,
    view_as_real,
    view_as_real_mat,
)
from pyxu_tpu.utils.inspect import import_module, parse_params  # noqa: F401
from pyxu_tpu.utils.misc import (  # noqa: F401
    as_canonical_shape,
    broadcast_shapes_leading,
    infer_composition_shape,
    infer_sum_shape,
    next_fast_len,
    peaks,
    star_like_sample,
)
from pyxu_tpu.utils.vectorize import (  # noqa: F401
    batched_over,
    flatten_batch,
    unflatten_batch,
    vectorize,
)
from pyxu_tpu.utils.array_module import (  # noqa: F401
    compute,
    copy_if_unsafe,
    get_array_module,
    read_only,
    redirect,
    to_numpy,
)
from pyxu_tpu.utils.profiler import timed, trace  # noqa: F401

to_NUMPY = to_numpy  # reference spelling (util/array_module.py:85-114)
