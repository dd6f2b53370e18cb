"""download_and_extract: md5 verification + archive extraction via file:// —
the dataset-download machinery without network."""

import hashlib
import os
import tarfile
import zipfile

import pytest

from mcm_tpu.data.datasets import download_and_extract


def _make_tar(tmp_path):
    payload = tmp_path / "payload"
    (payload / "inner").mkdir(parents=True)
    (payload / "inner" / "hello.txt").write_text("hi")
    archive = tmp_path / "data.tar.gz"
    with tarfile.open(archive, "w:gz") as tar:
        tar.add(payload / "inner", arcname="inner")
    return archive


def test_extract_tar_with_md5(tmp_path):
    archive = _make_tar(tmp_path)
    md5 = hashlib.md5(archive.read_bytes()).hexdigest()
    dest = tmp_path / "dest"
    dest.mkdir()
    # pre-place the archive: download step is skipped, extraction runs
    (dest / archive.name).write_bytes(archive.read_bytes())
    download_and_extract(f"file://unused/{archive.name}", str(dest), md5)
    assert (dest / "inner" / "hello.txt").read_text() == "hi"


def test_md5_mismatch_raises(tmp_path):
    archive = _make_tar(tmp_path)
    dest = tmp_path / "dest"
    dest.mkdir()
    (dest / archive.name).write_bytes(archive.read_bytes())
    with pytest.raises(RuntimeError, match="md5 mismatch"):
        download_and_extract(f"file://unused/{archive.name}", str(dest),
                             "0" * 32)


def test_zip_extraction(tmp_path):
    dest = tmp_path / "dest"
    dest.mkdir()
    archive = dest / "data.zip"
    with zipfile.ZipFile(archive, "w") as zf:
        zf.writestr("a/b.txt", "zzz")
    download_and_extract(f"file://unused/{archive.name}", str(dest), None)
    assert (dest / "a" / "b.txt").read_text() == "zzz"


def test_missing_download_raises_helpfully(tmp_path):
    with pytest.raises(RuntimeError, match="place the archive"):
        download_and_extract("http://127.0.0.1:1/none.tar.gz",
                             str(tmp_path), None)
