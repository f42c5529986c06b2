"""Native C++ parser tests (skip if the toolchain is unavailable)."""

import numpy as np
import pytest

from next3d_tpu.native.build import load_objparse, parse_floats, parse_vertices
from next3d_tpu.utils.obj_io import load_lms, load_obj_verts

DEMO = "/root/reference/data/demo/demo.obj"
KPT = "/root/reference/data/demo/demo_kpt2d.txt"


@pytest.fixture(scope="module")
def lib():
    lib = load_objparse()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


def test_native_obj_matches_python(lib):
    import os
    if not os.path.exists(DEMO):
        pytest.skip("demo mesh absent")
    want = load_obj_verts(DEMO)
    got = parse_vertices(DEMO)
    assert got.shape == want.shape == (5023, 3)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)


def test_native_lms_matches_python(lib):
    import os
    if not os.path.exists(KPT):
        pytest.skip("demo lms absent")
    want = load_lms(KPT)
    got = parse_floats(KPT).reshape(want.shape)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)


def test_native_is_faster(lib, tmp_path):
    import time
    # synthesize a big obj
    rng = np.random.RandomState(0)
    verts = rng.randn(50000, 3).astype(np.float32)
    p = tmp_path / "big.obj"
    with open(p, "w") as f:
        for v in verts:
            f.write(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")

    def pure_python(path):
        out = []
        with open(path) as f:
            for line in f:
                if line.startswith('v '):
                    parts = line.split()
                    out.append((float(parts[1]), float(parts[2]),
                                float(parts[3])))
        return np.asarray(out, np.float32)

    t0 = time.perf_counter()
    a = pure_python(p)
    t_py = time.perf_counter() - t0
    t0 = time.perf_counter()
    b = parse_vertices(p, max_verts=60000)
    t_native = time.perf_counter() - t0
    np.testing.assert_allclose(a, b, atol=1e-4)
    assert t_native < t_py, (t_native, t_py)
