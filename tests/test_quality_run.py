"""Smoke test for the converged-run quality ledger driver.

``scripts/quality_run.py`` is the framework's counterpart of the
reference's trained sample grids (``/root/reference/README.md:32-51``):
it trains every stage and records PSNR/CE trajectories into
``quality.json``.  The full run is real-hardware only (QUALITY.md); this
smoke drives the SAME script end-to-end at ``--smoke`` scale so the
driver itself (dataset synthesis, stage chaining, per-checkpoint eval,
artifact collection, report schema) is CI-covered.
"""

import json
import pathlib
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

REPO = pathlib.Path(__file__).resolve().parent.parent


def test_quality_run_smoke(tmp_path):
    result = subprocess.run(
        [sys.executable, "scripts/quality_run.py", "--smoke",
         "--out-dir", str(tmp_path), "--device", "cpu"],
        capture_output=True, text=True, timeout=1800, cwd=str(REPO))
    assert result.returncode == 0, (result.stdout[-2000:] +
                                    result.stderr[-2000:])

    report = json.loads((tmp_path / "quality.json").read_text())
    stages = report["stages"]

    # every pipeline stage reported
    assert "autoencoder" in stages
    assert any(k.startswith("codebook_") for k in stages)
    assert "transformer_base" in stages
    assert any(k.startswith("transformer_casc") for k in stages)
    assert "generation" in stages

    # trajectories are non-empty and carry real numbers
    ae = stages["autoencoder"]
    assert len(ae["psnr_trajectory"]) >= 2
    assert all(isinstance(p["psnr_recon_db"], float)
               for p in ae["psnr_trajectory"])
    assert len(ae["loss_curve"]) >= 2
    for key, st in stages.items():
        if key.startswith("codebook_"):
            assert len(st["psnr_trajectory"]) >= 2
        if key.startswith("transformer_"):
            assert len(st["loss_curve"]) >= 2

    # the final generation grid and collected artifacts exist
    assert pathlib.Path(stages["generation"]["grid"]).exists()
    grids = tmp_path / "grids"
    assert (grids / "generated_final.jpg").exists()
    assert (grids / "dataset_sample.png").exists()


def test_quality_run_stop_after_codebooks(tmp_path):
    """--stop-after codebooks leaves a consumable partial run: the report,
    the trained codebook checkpoints, and the tf_*.json configs that
    scripts/quality_bf16_ab.py reads — without training any transformer."""
    result = subprocess.run(
        [sys.executable, "scripts/quality_run.py", "--smoke",
         "--stop-after", "codebooks",
         "--out-dir", str(tmp_path), "--device", "cpu"],
        capture_output=True, text=True, timeout=1800, cwd=str(REPO))
    assert result.returncode == 0, (result.stdout[-2000:] +
                                    result.stderr[-2000:])

    report = json.loads((tmp_path / "quality.json").read_text())
    assert report["stopped_after"] == "codebooks"
    stages = report["stages"]
    assert "autoencoder" in stages
    assert any(k.startswith("codebook_") for k in stages)
    assert not any(k.startswith("transformer_") for k in stages)

    # the transformer configs the A/B probe consumes are written
    assert (tmp_path / "tf_base.json").exists()
    # codebook checkpoints referenced by the report exist on disk
    for key, st in stages.items():
        if key.startswith("codebook_"):
            assert pathlib.Path(st["checkpoint"]).exists()
