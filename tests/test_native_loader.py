"""Native C++ batched loader vs the Python codec."""

import numpy as np
import pytest

from srhmm_tpu.io import read_list, read_perfil
from srhmm_tpu.io.native_loader import (
    load_batch_native,
    native_available,
    scan_perfil,
)


def test_native_builds():
    assert native_available(), "g++ toolchain should be present in this image"


def test_scan_matches_python(perfil_dir):
    paths = [str(p) for p in sorted(perfil_dir.glob("*.perfil"))]
    info = scan_perfil(paths)
    for i, p in enumerate(paths):
        f = read_perfil(p)
        assert tuple(info[i]) == f.shape


@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_load_batch_matches_python(perfil_dir, dtype):
    paths = [str(p) for p in sorted(perfil_dir.glob("*.perfil"))]
    t_max = 256
    feats, lengths = load_batch_native(paths, t_max, 9, dtype=dtype)
    assert feats.shape == (len(paths), t_max, 9)
    for i, p in enumerate(paths):
        ref = read_perfil(p)
        assert lengths[i] == len(ref)
        np.testing.assert_allclose(
            feats[i, : lengths[i]], ref.astype(dtype), rtol=1e-6
        )
        assert (feats[i, lengths[i] :] == 0).all()


def test_truncation_at_t_max(perfil_dir):
    paths = [str(sorted(perfil_dir.glob("*.perfil"))[0])]
    feats, lengths = load_batch_native(paths, 50, 9)
    assert lengths[0] == 50


def test_missing_file_strict_raises(tmp_path):
    with pytest.raises(IOError):
        load_batch_native([str(tmp_path / "nope.perfil")], 10, 9)


def test_wrong_dim_flagged(perfil_dir):
    paths = [str(sorted(perfil_dir.glob("*.perfil"))[0])]
    with pytest.raises((IOError, ValueError)):
        load_batch_native(paths, 10, 13)


def test_load_batch_native_path_matches_python(perfil_dir, tmp_path):
    """The production input path (io/dataset.load_batch) must produce
    byte-identical batches through the native loader and the pure-Python
    fallback — this is what the fast-path CLI and bench now consume."""
    import numpy as np

    from srhmm_tpu.io.dataset import load_batch
    from srhmm_tpu.io.native_loader import native_available

    paths = sorted(perfil_dir.glob("*.perfil"))
    lst = tmp_path / "list.txt"
    lst.write_text("\n".join(str(p) for p in paths) + "\n")
    a = load_batch(lst, dtype="float64", native=native_available())
    b = load_batch(lst, dtype="float64", native=False)
    np.testing.assert_array_equal(np.asarray(a.features), np.asarray(b.features))
    np.testing.assert_array_equal(np.asarray(a.lengths), np.asarray(b.lengths))
