"""Pinned bands for the committed v2-scene family scoreboard and the
LoFTR threshold de-leak artifacts (round-5 campaign, chip-measured).

These pin the COMMITTED artifacts (results/*.json), not a re-run: the
sweep costs ~1 h through the tunnel, so the regression surface is the
artifact a future run must re-produce within band. Regenerate with

    python experiments/v2_scoreboard.py --seeds 0,1,2,3,4,5,6,7
    python experiments/loftr_heldout.py --seeds 4,5,6,7

Reference capability measured: end decisions of the semantic gate on a
parallax/occlusion/aliasing scene (semantic_evaluation.py:23-66 over
the multi-floor aliasing problem of the reference README.md:9-11);
family rows mirror the reference's matcher menu
(geometric_verification.py:353-421 SuperGlue, :424-526 LoFTR).
"""

import json
import os

import pytest

ROOT = os.path.join(os.path.dirname(__file__), "..", "results")
SCOREBOARD = os.path.join(ROOT, "quality_v2_scoreboard.json")
HELDOUT = os.path.join(ROOT, "loftr_heldout.json")

pytestmark = pytest.mark.smoke


def _load(path):
    if not os.path.exists(path):
        pytest.skip(f"{os.path.basename(path)} not committed")
    with open(path) as f:
        return json.load(f)


class TestScoreboard:
    def test_complete(self):
        r = _load(SCOREBOARD)
        assert r["seeds"] == list(range(8))
        assert set(r["families"]) >= {"trained", "superglue", "orb", "loftr"}
        for fam, d in r["families"].items():
            assert len(d["per_seed"]) == 8, fam
            # every row carries the encoder's retrieval recall
            assert all(
                e["retrieval_recall"] is not None for e in d["per_seed"]
            ), fam

    def test_parallax_checkpoints_used(self):
        fams = _load(SCOREBOARD)["families"]
        assert fams["trained"]["weights"] == "lightglue_parallax_sp.npz"
        assert fams["superglue"]["weights"] == "superglue_parallax.npz"
        assert fams["loftr"]["weights"] == "loftr_parallax.npz"
        assert fams["orb"]["weights"] == "orb_weight_free"

    def test_top_family_bands(self):
        fams = _load(SCOREBOARD)["families"]
        # parallax-trained LightGlue + LoFTR both clear 0.82 mean F1
        # (measured 0.863 / 0.868) with high precision — the round-4
        # provisional homography-stack number was 0.359
        for fam in ("trained", "loftr"):
            assert fams[fam]["f1_mean"] >= 0.82, fam
            assert fams[fam]["precision_mean"] >= 0.90, fam

    def test_nothing_saturates(self):
        fams = _load(SCOREBOARD)["families"]
        for fam, d in fams.items():
            assert d["f1_mean"] <= 0.99, (fam, "scene saturated again")

    def test_weight_free_floor(self):
        orb = _load(SCOREBOARD)["families"]["orb"]
        # weight-free ORB under parallax+scale: precise but low-recall
        assert orb["precision_mean"] >= 0.95
        assert 0.10 <= orb["f1_mean"] <= 0.50

    def test_superglue_diagnosis_or_calibrated(self):
        # the committed superglue row was measured WITHOUT the
        # confident-match cut (build_verifier historically never applied
        # it to SuperGlue): high recall, collapsed precision (0.81/0.25).
        # The calibrated cut (results/superglue_cut.json) later became
        # the build_verifier default, so a REGENERATED scoreboard shows
        # the post-cut row (~0.60/0.58) instead. Accept either
        # generation, pinning each to its own band.
        sg = _load(SCOREBOARD)["families"]["superglue"]
        if sg["precision_mean"] < 0.45:  # pre-cut generation
            assert sg["recall_mean"] >= 0.70
            assert sg["f1_mean"] >= 0.25
        else:  # post-cut generation
            assert sg["f1_mean"] >= 0.50

    def test_superglue_cut_calibration(self):
        r = _load(os.path.join(ROOT, "superglue_cut.json"))
        assert r["select_seeds"] == [0, 1, 2, 3]
        assert r["holdout_seeds"] == [4, 5, 6, 7]
        # measured: chosen cut 16, held-out F1 0.384 (uncut) -> 0.605
        assert r["chosen_cut"] >= 8
        assert r["chosen_holdout_f1"] >= r["uncut_holdout_f1"] + 0.10
        assert r["chosen_holdout_f1"] >= 0.55
        from mlis_tpu.eval.quality import SUPERGLUE_CONFIDENT_CUT

        # the productized default IS the calibrated value
        assert SUPERGLUE_CONFIDENT_CUT == r["chosen_cut"]

    def test_retrieval_is_binding_for_top_families(self):
        r = _load(SCOREBOARD)
        rr = [
            e["retrieval_recall"]
            for e in r["families"]["trained"]["per_seed"]
        ]
        rr_mean = sum(rr) / len(rr)
        assert 0.70 <= rr_mean <= 0.95  # vpr_tiny_v2 band (measured 0.806)
        # end recall cannot exceed retrieval recall; top families sit
        # near the ceiling (within 0.08 of it)
        assert r["families"]["trained"]["recall_mean"] <= rr_mean + 1e-9
        assert r["families"]["trained"]["recall_mean"] >= rr_mean - 0.08


class TestLoftrHeldout:
    def test_heldout_band(self):
        r = _load(HELDOUT)
        assert r["seeds"] == [4, 5, 6, 7]
        # selection (seeds 0-3) mean was 0.929; the fixed 0.05 threshold
        # must generalize: measured held-out mean 0.940, precision 1.0
        assert r["f1_mean"] >= 0.85
        assert r["precision_mean"] >= 0.99


class TestRerankArtifact:
    def test_rerank_null_result(self):
        r = _load(os.path.join(ROOT, "rerank_scoreboard.json"))
        assert "vpr_tiny_v2" in r["backbone"]
        # measured: identical retrieval recall and mean F1 to 3 decimals
        # (per-seed deltas -0.007..+0.009). Pin the null result with a
        # little slack so a re-run doesn't flap.
        assert abs(r["rr_on_mean"] - r["rr_off_mean"]) <= 0.02
        assert abs(r["f1_on_mean"] - r["f1_off_mean"]) <= 0.03
        for e in r["per_seed"]:
            assert abs(e["f1_on"] - e["f1_off"]) <= 0.05, e


class TestRooflineArtifacts:
    def test_memory_bound_proof(self):
        half = _load(os.path.join(ROOT, "roofline_halfres.json"))
        full = _load(os.path.join(ROOT, "roofline_fullres.json"))
        # HBM-bound stages hold >= 80% of stage time on both protocols
        assert half["value"] >= 0.80
        assert full["value"] >= 0.80
        # fullres mega MFU clears the round-3 task-3 bar
        assert full["vs_baseline"] >= 0.20
        # match dominates and, at fullres, runs at the HBM roofline
        assert full["stages"]["match"]["frac_hbm"] >= 0.9
        for d in (half, full):
            total = sum(s["seconds"] for s in d["stages"].values())
            assert d["stages"]["match"]["seconds"] / total >= 0.5


class TestEncoderRows:
    def test_four_encoder_menu_complete(self):
        r = _load(os.path.join(ROOT, "vpr_encoder_rows.json"))
        encs = r["encoders"]
        # the reference's full VPR menu (place_recognition.py:829-841)
        # plus the pixel floor and the deployed tiny encoder
        assert {"pixel", "trained_vpr_v2", "mixvpr_trained",
                "salad", "anyloc"} <= set(encs)
        # every trained encoder beats the pixel floor (measured 0.488)
        pix = encs["pixel"]["retrieval_recall_mean"]
        for name in ("trained_vpr_v2", "mixvpr_trained", "salad", "anyloc"):
            assert encs[name]["retrieval_recall_mean"] > pix + 0.05, name
        # MixVPR is the best v2 retriever (measured 0.844 vs tiny 0.770)
        assert (encs["mixvpr_trained"]["retrieval_recall_mean"]
                >= encs["trained_vpr_v2"]["retrieval_recall_mean"])

    def test_floor_gate_ablation(self):
        r = _load(os.path.join(ROOT, "vpr_encoder_rows.json"))
        # without the floor gate the aliased traps verify: precision
        # collapses (measured 0.175 / F1 0.287 vs 0.873 gated, seed 0)
        assert r["precision_no_floor_gate"] <= 0.5
        assert r["f1_no_floor_gate"] <= 0.5
