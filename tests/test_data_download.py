# -*- coding: utf-8 -*-
"""Offline tests for the download/extraction/cleanup host tooling.

Network calls are monkeypatched; the URL builders, retry-with-integrity
semantics, 404 tolerance, gz/zip extraction and cleanup are exercised for
real. Reference: ``climsr/preprocessing/data_download.py`` (URL tables,
retry x3, 404 tolerance) and ``climsr/preprocessing/cleanup.py``.
"""
import gzip
import os
import zipfile

import pandas as pd

from climsr_tpu.preprocessing import data_download as dd
from climsr_tpu.preprocessing.cleanup import cleanup
from climsr_tpu.preprocessing.scrape_polish_mountains import build_fallback_table


def test_url_builders_cover_reference_tables():
    cruts = dd.get_cruts_data_download_urls()
    # reference downloads only the temperature vars (tmn/tmp/tmx), not pre
    assert len(cruts) == 3
    assert all("cru_ts4.05" in u and u.endswith(".gz") for u in cruts)

    hist = dd.get_world_clim_historical_climate_data_download_urls()
    assert all("wc2.1" in u for u in hist)
    weather = dd.get_world_clim_historical_weather_data_download_urls()
    assert all(u.endswith(".zip") for u in weather)
    future = dd.get_world_clim_future_climate_data_download_urls()
    # 9 GCMs x 4 SSP scenarios per variable/resolution/period combination
    assert len(future) >= 9 * 4
    assert all("/fut/" in u and "ssp" in u and u.endswith(".zip") for u in future)


def test_download_file_tolerates_404(tmp_path, monkeypatch):
    class Resp:
        status_code = 404
        reason = "Not Found"

    class FakeRequests:
        @staticmethod
        def get(url, stream=True):
            return Resp()

    monkeypatch.setitem(__import__("sys").modules, "requests", FakeRequests)
    fname, err = dd.download_file("http://x/y.zip", str(tmp_path))
    assert fname is None and err == "Not Found"


def test_download_file_skips_existing(tmp_path):
    existing = tmp_path / "a.gz"
    existing.write_bytes(b"x")
    fname, err = dd.download_file("http://x/a.gz", str(tmp_path))
    assert fname == str(existing) and err is None


def test_retry_on_corrupt_archive(tmp_path, monkeypatch):
    """A corrupt download is deleted and re-fetched up to MAX_RETRY_COUNT; a
    good second attempt succeeds (the reference's integrity-check loop)."""
    calls = {"n": 0}
    payload_ok = None

    # a real gz payload for the good attempt
    src = tmp_path / "payload.txt"
    src.write_text("climate")
    gz_path = tmp_path / "payload.txt.gz"
    with open(src, "rb") as fi, gzip.open(gz_path, "wb") as fo:
        fo.write(fi.read())
    payload_ok = gz_path.read_bytes()

    dl_dir = tmp_path / "dl"

    def fake_download(url, download_dir):
        calls["n"] += 1
        arch = os.path.join(download_dir, "archives")
        os.makedirs(arch, exist_ok=True)
        out = os.path.join(arch, url.split("/")[-1])
        with open(out, "wb") as f:
            f.write(b"garbage-not-gzip" if calls["n"] == 1 else payload_ok)
        return out, None

    monkeypatch.setattr(dd, "download_file", fake_download)
    dd.try_file_download_and_extraction("http://x/data.txt.gz", str(dl_dir))
    assert calls["n"] == 2
    # extraction lands next to the archive with archives -> extracted swapped
    extracted = dl_dir / "extracted" / "data.txt"
    assert extracted.read_text() == "climate"


def test_zip_extraction(tmp_path):
    arch = tmp_path / "archives"
    arch.mkdir()
    z = arch / "bundle.zip"
    with zipfile.ZipFile(z, "w") as zf:
        zf.writestr("inner/file.tif", b"tifdata")
    dd.handle_file_extraction(str(z))
    assert (tmp_path / "extracted" / "bundle" / "inner" / "file.tif").read_bytes() == b"tifdata"


def test_cleanup_removes_matching_files(tmp_path):
    (tmp_path / "sub").mkdir()
    keep = tmp_path / "keep.nc"
    keep.write_text("k")
    for i in range(5):
        (tmp_path / "sub" / f"t{i}.tif").write_text("x")
    removed = cleanup(str(tmp_path), pattern="**/*.tif", n_workers=2)
    assert removed == 5
    assert keep.exists()
    assert not list((tmp_path / "sub").glob("*.tif"))


def test_scraper_fallback_table_matches_inspection_consts():
    df = build_fallback_table()
    assert isinstance(df, pd.DataFrame)
    assert set(df.columns) == {"name", "lat", "lon", "altitude"}
    assert len(df) >= 20  # the 23 reference inspection locations
    assert df["lat"].between(49, 55).all()  # Polish peaks
