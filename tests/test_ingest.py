"""Ingest tests: native reader vs numpy fallback, byte-for-byte."""

import numpy as np
import pytest

from rptree_tpu.utils import ingest


def _write_fvecs(path, arr):
    with open(path, "wb") as fh:
        for row in arr:
            np.int32(arr.shape[1]).tofile(fh)
            row.astype(np.float32).tofile(fh)


def _write_ivecs(path, arr):
    with open(path, "wb") as fh:
        for row in arr:
            np.int32(arr.shape[1]).tofile(fh)
            row.astype(np.int32).tofile(fh)


def _write_bvecs(path, arr):
    with open(path, "wb") as fh:
        for row in arr:
            np.int32(arr.shape[1]).tofile(fh)
            row.astype(np.uint8).tofile(fh)


def _write_idx(path, arr):
    n, d = arr.shape
    with open(path, "wb") as fh:
        fh.write(bytes([0, 0, 0x08, 2]))
        fh.write(np.array([n, d], ">u4").tobytes())
        arr.astype(np.uint8).tofile(fh)


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(13)
    return rng.normal(size=(37, 12)).astype(np.float32)


def test_native_builds():
    assert ingest.native_available(), "native ingest library failed to build"


def test_fvecs_roundtrip(tmp_path, data):
    p = str(tmp_path / "a.fvecs")
    _write_fvecs(p, data)
    assert ingest.fvecs_meta(p) == (37, 12)
    np.testing.assert_array_equal(ingest.read_fvecs(p), data)
    np.testing.assert_array_equal(ingest.read_fvecs(p, start=5, count=10),
                                  data[5:15])


def test_ivecs_roundtrip(tmp_path):
    ids = np.arange(60, dtype=np.int32).reshape(6, 10)
    p = str(tmp_path / "gt.ivecs")
    _write_ivecs(p, ids)
    np.testing.assert_array_equal(ingest.read_ivecs(p), ids)


def test_bvecs_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    raw = rng.integers(0, 256, size=(11, 16)).astype(np.uint8)
    p = str(tmp_path / "b.bvecs")
    _write_bvecs(p, raw)
    assert ingest.bvecs_meta(p) == (11, 16)
    np.testing.assert_array_equal(ingest.read_bvecs(p),
                                  raw.astype(np.float32))


def test_idx_roundtrip(tmp_path):
    rng = np.random.default_rng(4)
    raw = rng.integers(0, 256, size=(9, 28)).astype(np.uint8)
    p = str(tmp_path / "d.idx")
    _write_idx(p, raw)
    assert ingest.idx_meta(p) == (9, 28)
    np.testing.assert_allclose(ingest.read_idx(p, scale=1 / 255.0),
                               raw.astype(np.float32) / 255.0, rtol=1e-6)


def test_native_matches_numpy_fallback(tmp_path, data, monkeypatch):
    p = str(tmp_path / "a.fvecs")
    _write_fvecs(p, data)
    native = ingest.read_fvecs(p)
    monkeypatch.setattr(ingest, "_lib", None)
    monkeypatch.setattr(ingest, "_lib_tried", True)
    fallback = ingest.read_fvecs(p)
    np.testing.assert_array_equal(native, fallback)


def test_source_chunks_match_bulk(tmp_path, data):
    p = str(tmp_path / "a.fvecs")
    _write_fvecs(p, data)
    chunks = list(ingest.fvecs_source(p, chunk_size=10))
    assert [c.shape[0] for c in chunks] == [10, 10, 10, 7]
    np.testing.assert_array_equal(np.concatenate(chunks), data)


def test_streaming_build_from_fvecs(tmp_path, data):
    import rptree_tpu as rt

    p = str(tmp_path / "a.fvecs")
    _write_fvecs(p, data)
    f = rt.forest(3, 3, 4, 2, 10, 1.0, 12, ingest.fvecs_source(p, 10))
    assert f.tree_size() == 37


def test_bad_format_raises(tmp_path):
    p = str(tmp_path / "junk.fvecs")
    with open(p, "wb") as fh:
        fh.write(b"\x01\x02\x03")
    with pytest.raises(ValueError):
        ingest.fvecs_meta(p)


def test_fvecs_ivecs_writer_roundtrip(tmp_path):
    """write_fvecs / write_ivecs produce files the (native or numpy)
    readers parse back exactly -- the dataset-export half of the ingest
    tier (used by the recorded file->serve pipeline run)."""
    from rptree_tpu.utils import ingest

    rng = np.random.default_rng(3)
    x = rng.normal(size=(37, 12)).astype(np.float32)
    p = str(tmp_path / "x.fvecs")
    ingest.write_fvecs(p, x)
    assert ingest.fvecs_meta(p) == (37, 12)
    np.testing.assert_array_equal(ingest.read_fvecs(p), x)
    np.testing.assert_array_equal(ingest.read_fvecs(p, 5, 4), x[5:9])
    ids = rng.integers(0, 1000, size=(9, 10)).astype(np.int32)
    pi = str(tmp_path / "gt.ivecs")
    ingest.write_ivecs(pi, ids)
    np.testing.assert_array_equal(ingest.read_ivecs(pi), ids)
