"""Checksum gate of the CLIP fetcher (no network: local files only)."""

import hashlib
import os

import pytest

from coda_neurips2023_tpu.utils.download_clip import (
    VIT_B16_SHA256,
    VIT_B16_URL,
    fetch_vit_b16,
    sha256_of,
)


def test_existing_file_verifies(tmp_path):
    p = tmp_path / "ViT-B-16.pt"
    p.write_bytes(b"payload")
    h = hashlib.sha256(b"payload").hexdigest()
    assert sha256_of(str(p)) == h
    assert fetch_vit_b16(str(tmp_path), expected_sha256=h) == str(p)


def test_mismatch_raises_and_removes(tmp_path):
    p = tmp_path / "ViT-B-16.pt"
    p.write_bytes(b"corrupt")
    with pytest.raises(RuntimeError, match="sha256 mismatch"):
        fetch_vit_b16(str(tmp_path), expected_sha256="0" * 64)
    assert not p.exists()


def test_url_embeds_the_pinned_sha():
    # the reference loader derives expected_sha256 from the URL path
    # (/root/reference/CLIP/clip/clip.py:49); keep ours consistent
    assert VIT_B16_SHA256 in VIT_B16_URL
    assert os.path.basename(VIT_B16_URL) == "ViT-B-16.pt"
