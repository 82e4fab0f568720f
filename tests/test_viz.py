

def test_plot_training_curves(tmp_path):
    import json
    import os

    from mlis_tpu.viz.figures import plot_training_curves

    shipped = os.path.join(
        os.path.dirname(__file__), "..", "checkpoints",
        "lightglue_homog_log.json",
    )
    if os.path.exists(shipped):
        log = shipped
    else:
        log = str(tmp_path / "log.json")
        with open(log, "w") as f:
            json.dump({"loss": [(10, 1.0), (20, 0.5)],
                       "eval": [(0, 0.0, 0.0), (20, 0.5, 0.8)]}, f)
    out = plot_training_curves(log, tmp_path / "curves.png")
    assert out.exists() and out.stat().st_size > 5000
