"""URL/download cache (vilbert_tpu/utils/cached_path.py vs utils.py:485-682).

Runs entirely against localhost / file:// URLs — no egress needed.
"""

import json
import os
import threading
from functools import partial
from http.server import HTTPServer, SimpleHTTPRequestHandler

import pytest

from vilbert_tpu.utils.cached_path import (
    cached_path,
    filename_to_url,
    get_from_cache,
    url_to_filename,
)


def test_local_path_passthrough(tmp_path):
    f = tmp_path / "weights.bin"
    f.write_bytes(b"x" * 16)
    assert cached_path(str(f)) == str(f)


def test_missing_local_path_raises(tmp_path):
    with pytest.raises(EnvironmentError):
        cached_path(str(tmp_path / "nope.bin"))


def test_unknown_scheme_raises(tmp_path):
    with pytest.raises(ValueError):
        cached_path("gs://bucket/key", cache_dir=str(tmp_path))


def test_file_url_downloads_once(tmp_path):
    src = tmp_path / "model.npz"
    src.write_bytes(b"npz-payload")
    cache = tmp_path / "cache"
    url = src.as_uri()

    p1 = cached_path(url, cache_dir=str(cache))
    assert p1.startswith(str(cache))
    assert open(p1, "rb").read() == b"npz-payload"
    # metadata sidecar records the url (filename_to_url round-trips)
    assert filename_to_url(os.path.basename(p1), str(cache))[0] == url

    # second resolution is a pure cache hit: works after the source is gone
    src.unlink()
    assert cached_path(url, cache_dir=str(cache)) == p1


def _serve(directory):
    handler = partial(SimpleHTTPRequestHandler, directory=str(directory))
    httpd = HTTPServer(("127.0.0.1", 0), handler)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    return httpd, f"http://127.0.0.1:{httpd.server_address[1]}"


def test_http_download_and_cache_hit(tmp_path):
    (tmp_path / "srv").mkdir()
    (tmp_path / "srv" / "ckpt.bin").write_bytes(b"A" * 4096)
    cache = tmp_path / "cache"
    httpd, base = _serve(tmp_path / "srv")
    try:
        url = f"{base}/ckpt.bin"
        p1 = cached_path(url, cache_dir=str(cache))
        assert open(p1, "rb").read() == b"A" * 4096
        mtime = os.path.getmtime(p1)
        assert cached_path(url, cache_dir=str(cache)) == p1
        assert os.path.getmtime(p1) == mtime  # no re-download
    finally:
        httpd.shutdown()
    # server down, cache entry present -> still resolves offline
    assert cached_path(url, cache_dir=str(cache)) == p1


def test_offline_falls_back_to_newest_cached_copy(tmp_path):
    """Download failure + an older (different-etag) cached copy -> that copy
    is returned with a warning instead of raising."""
    cache = tmp_path / "cache"
    cache.mkdir()
    url = "http://127.0.0.1:1/gone.bin"  # nothing listens on port 1
    stale = cache / url_to_filename(url, etag="old-etag")
    stale.write_bytes(b"stale-but-usable")
    with open(str(stale) + ".json", "w") as f:
        json.dump({"url": url, "etag": "old-etag"}, f)

    assert get_from_cache(url, cache_dir=str(cache), timeout=2) == str(stale)


def test_download_failure_without_cache_raises(tmp_path):
    with pytest.raises(OSError):
        get_from_cache(
            "http://127.0.0.1:1/gone.bin", cache_dir=str(tmp_path), timeout=2
        )
