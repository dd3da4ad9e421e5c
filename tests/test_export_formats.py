"""MATLAB / HDF5 field export round-trips (beyond-reference persistence).

The reference persists npy stacks and CSV tables only
(/root/reference/src/torchPIV/PlotterFunctions.py:48-65); ``save_mat`` /
``save_hdf5`` add the interchange formats PIV users feed into MATLAB/PIVlab
and HDF5 toolchains.
"""
import os

import numpy as np
import pytest

from torchpiv_tpu.utils.persistence import save_hdf5, save_mat


@pytest.fixture
def field():
    r, c = 7, 9
    y, x = np.mgrid[0:r, 0:c].astype(np.float64)
    u = np.sin(x / 3.0) + 0.1 * y
    v = np.cos(y / 2.0) - 0.05 * x
    return x, y, u, v


def test_save_mat_roundtrip(field, tmp_path):
    from scipy.io import loadmat

    x, y, u, v = field
    out = save_mat("field.mat", str(tmp_path), x, y, u, v,
                   scalars={"vorticity [1/s]": u - v})
    got = loadmat(out)
    np.testing.assert_allclose(got["u"], u)
    np.testing.assert_allclose(got["v"], v)
    np.testing.assert_allclose(got["x"], x)
    np.testing.assert_allclose(got["y"], y)
    # scalar key sanitised to a valid MATLAB identifier
    np.testing.assert_allclose(got["vorticity__1_s_"], u - v)


def test_save_mat_never_overwrites(field, tmp_path):
    x, y, u, v = field
    p1 = save_mat("field.mat", str(tmp_path), x, y, u, v)
    p2 = save_mat("field.mat", str(tmp_path), x, y, u, v)
    assert p1 != p2 and os.path.exists(p1) and os.path.exists(p2)


def test_save_mat_shape_mismatch(field, tmp_path):
    x, y, u, v = field
    with pytest.raises(ValueError, match="shape"):
        save_mat("bad.mat", str(tmp_path), x, y, u, v[:-1])
    with pytest.raises(ValueError, match="shape"):
        save_mat("bad.mat", str(tmp_path), x, y, u, v,
                 scalars={"w": v[:, :-1]})


def test_save_hdf5_roundtrip(field, tmp_path):
    h5py = pytest.importorskip("h5py")
    x, y, u, v = field
    out = save_hdf5("field.h5", str(tmp_path), x, y, u, v,
                    scalars={"swirl": np.abs(u)},
                    attrs={"scale_m_px": 1e-5, "dt_s": 0.001})
    with h5py.File(out, "r") as f:
        np.testing.assert_allclose(f["u"][...], u)
        np.testing.assert_allclose(f["v"][...], v)
        np.testing.assert_allclose(f["derived/swirl"][...], np.abs(u))
        assert f.attrs["scale_m_px"] == pytest.approx(1e-5)
        assert f.attrs["dt_s"] == pytest.approx(0.001)


def test_save_hdf5_shape_mismatch(field, tmp_path):
    pytest.importorskip("h5py")
    x, y, u, v = field
    with pytest.raises(ValueError, match="shape"):
        save_hdf5("bad.h5", str(tmp_path), x[:-1], y, u, v)
    with pytest.raises(ValueError, match="shape"):
        save_hdf5("bad.h5", str(tmp_path), x, y, u, v,
                  scalars={"w": v[1:]})
