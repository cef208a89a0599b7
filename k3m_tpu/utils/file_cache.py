"""Pretrained-file resolution and download cache.

Parity target: the reference's `cached_path` / `get_from_cache` stack
(vilbert_k3m/utils.py:582-737) — URL-or-path resolution with an
etag-keyed on-disk cache, plus `read_set_from_file`/filename helpers
(:740-753). The s3 branch (boto3, ref :614-660) is deliberately served by
the same HTTP path signature but raises a clear error when boto3 is absent;
this environment is zero-egress, so downloads only succeed where a local
mirror or file:// URL is used — the cache/etag logic itself is fully
functional and unit-tested.
"""

from __future__ import annotations

import json
import logging
import os
import shutil
import tempfile
from hashlib import sha256
from urllib.parse import urlparse

logger = logging.getLogger(__name__)

K3M_CACHE = os.getenv(
    "K3M_PRETRAINED_CACHE",
    os.path.join(os.path.expanduser("~"), ".cache", "k3m_pretrained"))


def url_to_filename(url: str, etag: str | None = None) -> str:
    """Deterministic cache filename: sha256(url)[.sha256(etag)]
    (ref url_to_filename, vilbert_k3m/utils.py:547-562)."""
    name = sha256(url.encode("utf-8")).hexdigest()
    if etag:
        name += "." + sha256(etag.encode("utf-8")).hexdigest()
    return name


def filename_to_url(filename: str, cache_dir: str | None = None):
    """Recover (url, etag) from a cache entry's .json sidecar
    (ref :565-579)."""
    cache_dir = cache_dir or K3M_CACHE
    meta_path = os.path.join(cache_dir, filename) + ".json"
    if not os.path.exists(meta_path):
        raise EnvironmentError(f"file {meta_path} not found")
    with open(meta_path, "r", encoding="utf-8") as f:
        meta = json.load(f)
    return meta["url"], meta.get("etag")


def _http_etag(url: str) -> str | None:
    import requests
    response = requests.head(url, allow_redirects=True, timeout=30)
    if response.status_code != 200:
        raise IOError(f"HEAD request failed for url {url} with status code "
                      f"{response.status_code}")
    return response.headers.get("ETag")


def _http_get(url: str, temp_file) -> None:
    import requests
    req = requests.get(url, stream=True, timeout=60)
    req.raise_for_status()   # never cache an error body as the weights file
    for chunk in req.iter_content(chunk_size=1 << 20):
        if chunk:
            temp_file.write(chunk)


def get_from_cache(url: str, cache_dir: str | None = None) -> str:
    """Download-once cache keyed by (url, etag) (ref get_from_cache,
    vilbert_k3m/utils.py:675-737). file:// URLs are 'downloaded' by copy,
    so the cache works offline."""
    cache_dir = cache_dir or K3M_CACHE
    os.makedirs(cache_dir, exist_ok=True)

    parsed = urlparse(url)
    if parsed.scheme == "file":
        etag = None
        src = parsed.path
        if not os.path.exists(src):
            raise EnvironmentError(f"file {src} not found")
    elif parsed.scheme == "s3":
        raise EnvironmentError(
            f"s3 URL {url} requires boto3 credentials; this build resolves "
            "pretrained weights from local paths or file:// URLs "
            "(zero-egress environment)")
    else:
        etag = _http_etag(url)
        src = None

    filename = url_to_filename(url, etag)
    cache_path = os.path.join(cache_dir, filename)
    if os.path.exists(cache_path):
        return cache_path

    with tempfile.NamedTemporaryFile(dir=cache_dir, delete=False) as tmp:
        if src is not None:
            with open(src, "rb") as f:
                shutil.copyfileobj(f, tmp)
        else:
            _http_get(url, tmp)
        tmp_name = tmp.name
    os.replace(tmp_name, cache_path)
    with open(cache_path + ".json", "w", encoding="utf-8") as f:
        json.dump({"url": url, "etag": etag}, f)
    logger.info("cached %s -> %s", url, cache_path)
    return cache_path


def cached_path(url_or_filename, cache_dir: str | None = None) -> str:
    """URL-or-path resolution (ref cached_path, vilbert_k3m/utils.py:582-611):
    local existing path -> returned as-is; http(s)/file URL -> fetched into
    the cache; missing local path -> EnvironmentError; anything else ->
    ValueError."""
    url_or_filename = str(url_or_filename)
    parsed = urlparse(url_or_filename)
    if parsed.scheme in ("http", "https", "s3", "file"):
        return get_from_cache(url_or_filename, cache_dir)
    if os.path.exists(url_or_filename):
        return url_or_filename
    if parsed.scheme == "":
        raise EnvironmentError(f"file {url_or_filename} not found")
    raise ValueError(
        f"unable to parse {url_or_filename} as a URL or as a local path")


def read_set_from_file(filename: str) -> set:
    """One-item-per-line set reader (ref :740-747)."""
    collection = set()
    with open(filename, "r", encoding="utf-8") as f:
        for line in f:
            collection.add(line.rstrip("\n"))
    return collection
