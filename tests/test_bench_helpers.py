"""Regression tests for bench.py helpers (warmup-dir selection must not
crash on non-numeric sf* directory names)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import pick_warmup_dir


def test_pick_warmup_dir_smallest_numeric(tmp_path):
    for d in ("sf0.001", "sf0.01", "sf0.1"):
        (tmp_path / d).mkdir()
    got = pick_warmup_dir(str(tmp_path / "sf0.1"))
    assert got == str(tmp_path / "sf0.001")


def test_pick_warmup_dir_ignores_non_numeric(tmp_path):
    for d in ("sf_scratch", "sfbroken", "sf0.01", "sf0.1"):
        (tmp_path / d).mkdir()
    got = pick_warmup_dir(str(tmp_path / "sf0.1"))
    assert got == str(tmp_path / "sf0.01")


def test_pick_warmup_dir_none_when_only_junk(tmp_path):
    (tmp_path / "sf_scratch").mkdir()
    assert pick_warmup_dir(str(tmp_path / "sf_scratch")) is None
