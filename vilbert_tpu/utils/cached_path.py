"""URL-or-path resolution with a local download cache.

TPU-native replacement for the reference's ``cached_path`` stack
(vilbert/utils.py:485-682): ``--from_pretrained`` (and any other artifact
argument routed through :func:`cached_path`) accepts http(s)/s3/file URLs
as well as local paths. URLs are downloaded once into a content-addressed
cache and the cached file path is returned.

Differences from the reference, by design:
- stdlib only (urllib) for http(s); boto3 stays an optional import that is
  only touched for ``s3://`` URLs (the reference hard-imports it),
- ``file://`` URLs are first-class (exercisable on a zero-egress box),
- offline fallback: when a download fails but an earlier copy of the SAME
  url is cached, the newest cached copy is returned with a warning instead
  of raising (the reference fails hard),
- cache dir is ``$VILBERT_TPU_DOWNLOADS`` (default
  ``~/.cache/vilbert_tpu/downloads``) instead of
  ``$PYTORCH_PRETRAINED_BERT_CACHE`` (``$VILBERT_TPU_CACHE`` is already the
  XLA compile cache, utils/cache.py).

The cache layout matches the reference's convention so it stays auditable:
``sha256(url)[.sha256(etag)]`` plus a ``<file>.json`` sidecar holding
``{"url": ..., "etag": ...}``.
"""

from __future__ import annotations

import glob
import json
import logging
import os
import shutil
import tempfile
from hashlib import sha256
from urllib.parse import urlparse
from urllib.request import Request, urlopen

logger = logging.getLogger(__name__)

CACHE_ENV_VAR = "VILBERT_TPU_DOWNLOADS"


def default_cache_dir() -> str:
    return os.environ.get(
        CACHE_ENV_VAR,
        os.path.join(os.path.expanduser("~"), ".cache", "vilbert_tpu", "downloads"),
    )


def url_to_filename(url: str, etag: str | None = None) -> str:
    """Repeatable content-addressed cache filename (utils.py:485-500)."""
    name = sha256(url.encode("utf-8")).hexdigest()
    if etag:
        name += "." + sha256(etag.encode("utf-8")).hexdigest()
    return name


def filename_to_url(filename: str, cache_dir: str | None = None) -> tuple[str, str | None]:
    """Read back the (url, etag) recorded for a cached file (utils.py:503-527)."""
    cache_dir = cache_dir or default_cache_dir()
    cache_path = os.path.join(cache_dir, filename)
    meta_path = cache_path + ".json"
    if not os.path.exists(cache_path) or not os.path.exists(meta_path):
        raise EnvironmentError(f"file {cache_path} not found")
    with open(meta_path, encoding="utf-8") as f:
        meta = json.load(f)
    return meta["url"], meta.get("etag")


def _http_etag(url: str, timeout: float) -> str | None:
    req = Request(url, method="HEAD")
    try:
        with urlopen(req, timeout=timeout) as resp:
            return resp.headers.get("ETag")
    except Exception:  # noqa: BLE001 — HEAD support is optional on servers
        return None


def _download_http(url: str, dst_fileobj, timeout: float) -> None:
    with urlopen(url, timeout=timeout) as resp:
        shutil.copyfileobj(resp, dst_fileobj, length=1 << 20)


def _download_s3(url: str, dst_fileobj) -> str | None:
    """s3://bucket/key download; returns the object ETag. boto3 is optional —
    the import lives here so http users never need it."""
    try:
        import boto3  # type: ignore[import-not-found]
    except ImportError as e:  # pragma: no cover - env without boto3
        raise EnvironmentError(
            f"s3 URL {url} requires boto3, which is not installed; "
            "download the file yourself and pass the local path"
        ) from e
    parsed = urlparse(url)
    bucket, key = parsed.netloc, parsed.path.lstrip("/")
    s3 = boto3.resource("s3")
    obj = s3.Object(bucket, key)
    etag = obj.e_tag.strip('"') if obj.e_tag else None
    obj.download_fileobj(dst_fileobj)
    return etag


def _newest_cached(url: str, cache_dir: str) -> str | None:
    """Newest cached copy of ``url`` regardless of etag (offline fallback)."""
    hits = [
        p
        for p in glob.glob(os.path.join(cache_dir, url_to_filename(url) + "*"))
        if not p.endswith(".json")
    ]
    return max(hits, key=os.path.getmtime) if hits else None


def get_from_cache(url: str, cache_dir: str | None = None, timeout: float = 60.0) -> str:
    """Return a local path for ``url``, downloading into the cache once
    per (url, etag) (utils.py:617-682)."""
    cache_dir = cache_dir or default_cache_dir()
    os.makedirs(cache_dir, exist_ok=True)
    scheme = urlparse(url).scheme

    etag: str | None = None
    if scheme in ("http", "https", "file"):
        etag = _http_etag(url, timeout) if scheme != "file" else None

    cache_path = os.path.join(cache_dir, url_to_filename(url, etag))
    if os.path.exists(cache_path):
        return cache_path

    # download to a temp file in the same directory, then atomically rename
    # so concurrent loaders never observe a partial file
    fd, tmp_path = tempfile.mkstemp(dir=cache_dir, suffix=".download")
    try:
        with os.fdopen(fd, "wb") as tmp:
            if scheme == "s3":
                etag = _download_s3(url, tmp)
                cache_path = os.path.join(cache_dir, url_to_filename(url, etag))
                if os.path.exists(cache_path):
                    os.remove(tmp_path)
                    return cache_path
            else:
                _download_http(url, tmp, timeout)
    except (EnvironmentError, OSError) as e:
        os.remove(tmp_path)
        stale = _newest_cached(url, cache_dir)
        if stale is not None:
            logger.warning(
                "download of %s failed (%s); using cached copy %s", url, e, stale
            )
            return stale
        raise
    os.replace(tmp_path, cache_path)
    with open(cache_path + ".json", "w", encoding="utf-8") as f:
        json.dump({"url": url, "etag": etag}, f)
    logger.info("cached %s -> %s", url, cache_path)
    return cache_path


def cached_path(url_or_filename: str, cache_dir: str | None = None) -> str:
    """URL → cached local path; local path → itself (utils.py:530-560)."""
    parsed = urlparse(str(url_or_filename))
    if parsed.scheme in ("http", "https", "s3", "file"):
        return get_from_cache(str(url_or_filename), cache_dir)
    if os.path.exists(url_or_filename):
        return str(url_or_filename)
    if parsed.scheme == "":
        raise EnvironmentError(f"file {url_or_filename} not found")
    raise ValueError(
        f"unable to parse {url_or_filename} as a URL or as a local path"
    )
