"""Checkpoint/resume subsystem (SURVEY.md §5): orbax save/load roundtrip
and the convert CLI end-to-end on a real torch file."""
import os
import subprocess
import sys

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from videovanish_tpu.core.checkpoint import load_pytree, maybe_load, save_pytree


class TestOrbaxRoundtrip:
    def test_save_load(self, tmp_path, rng):
        tree = {
            "unet": {"conv": {"kernel": jnp.asarray(
                rng.standard_normal((3, 3, 4, 8)).astype(np.float32))}},
            "scale": jnp.asarray([1.5], jnp.float32),
        }
        p = str(tmp_path / "ckpt")
        save_pytree(p, tree)
        back = load_pytree(p)
        np.testing.assert_array_equal(np.asarray(back["unet"]["conv"]["kernel"]),
                                      np.asarray(tree["unet"]["conv"]["kernel"]))
        np.testing.assert_array_equal(np.asarray(back["scale"]), [1.5])

    def test_maybe_load_missing_returns_none(self, tmp_path):
        assert maybe_load(str(tmp_path / "nope")) is None
        assert maybe_load(None) is None


class TestConvertCLI:
    def test_torch_file_to_orbax(self, tmp_path):
        # build a small torch state dict with diffusers-style keys
        state = {
            "conv_in.weight": torch.randn(8, 3, 3, 3),
            "conv_in.bias": torch.randn(8),
            "down_blocks.0.resnets.0.norm1.weight": torch.randn(8),
            "down_blocks.0.resnets.0.norm1.bias": torch.randn(8),
            "down_blocks.0.resnets.0.conv1.weight": torch.randn(8, 8, 3, 3),
            "time_embedding.linear_1.weight": torch.randn(32, 8),
        }
        pt = str(tmp_path / "model.pt")
        torch.save(state, pt)
        out = str(tmp_path / "out.orbax")
        r = subprocess.run(
            [sys.executable, "-m", "videovanish_tpu.cli.convert",
             "--input", pt, "--model", "unet", "--output", out],
            capture_output=True, text=True, cwd="/root/repo", timeout=300)
        assert r.returncode == 0, r.stderr[-1500:]
        assert "tensors" in r.stdout
        tree = load_pytree(out)
        # conv (O,I,kh,kw) -> (kh,kw,I,O)
        assert tuple(tree["conv_in"]["kernel"].shape) == (3, 3, 3, 8)
        # linear (O,I) -> (I,O)
        assert tuple(tree["time_embedding"]["linear_1"]["kernel"].shape) == (8, 32)
        # 1-D norm weight -> scale, under the block scope flattened to
        # ONE module name (matches the flax scopes; gated end-to-end by
        # tests/test_unet_oracle.py)
        assert "scale" in tree["down_blocks_0_resnets_0"]["norm1"]

    def test_dry_run_prints_structure(self, tmp_path):
        state = {"conv.weight": torch.randn(4, 2, 1, 1)}
        pt = str(tmp_path / "m.pt")
        torch.save(state, pt)
        r = subprocess.run(
            [sys.executable, "-m", "videovanish_tpu.cli.convert",
             "--input", pt, "--model", "raw", "--output", "unused",
             "--dry_run"],
            capture_output=True, text=True, cwd="/root/repo", timeout=300)
        assert r.returncode == 0
        assert "conv/kernel: (1, 1, 2, 4)" in r.stdout
