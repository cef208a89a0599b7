"""Tests for the pretrained-file cache (reference cached_path parity,
vilbert_k3m/utils.py:582-737) — exercised offline via local paths and
file:// URLs."""

import os

import pytest

from k3m_tpu.utils.file_cache import (
    cached_path, filename_to_url, get_from_cache, read_set_from_file,
    url_to_filename,
)


def test_local_path_passthrough(tmp_path):
    p = tmp_path / "weights.bin"
    p.write_bytes(b"abc")
    assert cached_path(str(p)) == str(p)


def test_missing_local_path_raises():
    with pytest.raises(EnvironmentError):
        cached_path("/nonexistent/weights.bin")


def test_bad_scheme_raises():
    with pytest.raises(ValueError):
        cached_path("ftp://host/weights.bin")


def test_file_url_cached_once(tmp_path):
    src = tmp_path / "model.bin"
    src.write_bytes(b"payload")
    cache = tmp_path / "cache"
    url = "file://" + str(src)
    c1 = cached_path(url, cache_dir=str(cache))
    assert open(c1, "rb").read() == b"payload"
    # sidecar metadata recovers the url
    u, etag = filename_to_url(os.path.basename(c1), cache_dir=str(cache))
    assert u == url and etag is None
    # second resolution hits the cache (no re-copy): mutate source, expect
    # the cached copy unchanged
    src.write_bytes(b"changed")
    c2 = cached_path(url, cache_dir=str(cache))
    assert c2 == c1
    assert open(c2, "rb").read() == b"payload"


def test_url_to_filename_etag_distinguishes():
    a = url_to_filename("http://x/y")
    b = url_to_filename("http://x/y", etag="v2")
    assert a != b and b.startswith(a.split(".")[0])


def test_read_set_from_file(tmp_path):
    f = tmp_path / "names.txt"
    f.write_text("alpha\nbeta\n\nalpha\n")
    assert read_set_from_file(str(f)) == {"alpha", "beta", ""}
