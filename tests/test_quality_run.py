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

    # stage 4 (prune) ran on every codebook; downstream consumed the
    # pruned checkpoints; the before/after PSNR pair is recorded
    for key, st in stages.items():
        if key.startswith("codebook_"):
            pr = st["prune"]
            assert 1 <= pr["kept"] <= pr["of"]
            assert pathlib.Path(pr["checkpoint"]).exists()
            assert isinstance(pr["psnr_quantized_db_after"], float)

    # the larger-K side experiment reported a trajectory
    exp = next(iter(report["experiments"].values()))
    assert len(exp["psnr_trajectory"]) >= 2
    assert exp["num_embeddings"] == 2 * exp["baseline_k"]

    # the final cascade stage trained under the stability tools and the
    # spike detector + preview-PSNR columns landed
    last_tf = [k for k in stages if k.startswith("transformer_casc")][-1]
    assert stages[last_tf]["stability"]["ema_decay"] > 0
    assert stages[last_tf]["stability"]["grad_clip"] > 0
    assert stages[last_tf]["ce_max_last_half"] is not None
    assert isinstance(stages[last_tf]["preview_psnr"], list)

    # the final generation grid and collected artifacts exist
    assert pathlib.Path(stages["generation"]["grid"]).exists()
    grids = tmp_path / "grids"
    assert (grids / "generated_final.jpg").exists()
    assert (grids / "dataset_sample.png").exists()

    # --resume on the finished run skips every training stage (file-based
    # completion detection) and still writes an equivalent report — this
    # is the kill-and-continue path quality_watchdog.py relies on
    result = subprocess.run(
        [sys.executable, "scripts/quality_run.py", "--smoke", "--resume",
         "--out-dir", str(tmp_path), "--device", "cpu"],
        capture_output=True, text=True, timeout=1800, cwd=str(REPO))
    assert result.returncode == 0, (result.stdout[-2000:] +
                                    result.stderr[-2000:])
    assert result.stdout.count("resume:") >= 8  # every stage skipped
    assert "retraining from scratch" not in result.stdout
    resumed = json.loads((tmp_path / "quality.json").read_text())
    assert resumed["stages"]["autoencoder"]["psnr_trajectory"] == \
        stages["autoencoder"]["psnr_trajectory"]
    assert set(resumed["stages"]) == set(stages)

    # the sampling sweep + renderer consume the finished run
    result = subprocess.run(
        [sys.executable, "scripts/sampling_sweep.py",
         "--qrun-dir", str(tmp_path), "--num-images", "4",
         "--temperatures", "2.0", "--device", "cpu"],
        capture_output=True, text=True, timeout=1800, cwd=str(REPO))
    assert result.returncode == 0, (result.stdout[-2000:] +
                                    result.stderr[-2000:])
    sweep = json.loads((tmp_path / "sweep.json").read_text())
    assert set(sweep["settings"]) == {"config", "single_path", "beams_t2"}
    for rec in sweep["settings"].values():
        assert 0 <= rec["unique_frac"] <= 1
        assert pathlib.Path(rec["grid"]).exists()

    result = subprocess.run(
        [sys.executable, "scripts/render_quality.py",
         "--report", str(tmp_path / "quality.json"),
         "--doc", str(tmp_path / "Q.md"),
         "--grids-dir", str(tmp_path / "docgrids")],
        capture_output=True, text=True, timeout=300, cwd=str(REPO))
    assert result.returncode == 0, (result.stdout[-2000:] +
                                    result.stderr[-2000:])
    doc = (tmp_path / "Q.md").read_text()
    for must in ("prune", "Side experiment", "Sampling knobs",
                 "max CE, 2nd half"):
        assert must in doc, must


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
