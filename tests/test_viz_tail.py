"""Visualization tail: RPE boxplots, paper-comparison bars, all-floors
overview, floor segmentation + LC detection, interactive 3D HTML export.

Covers the reference surface at evaluation/generate_figures.py:265-361,
visualization/plot_all_floors.py, and generate_paper_figures.py:56-122.
"""

import numpy as np

from mlis_tpu.viz.figures import (
    detect_loop_closure_events,
    export_interactive_3d_html,
    plot_all_floors_overview,
    plot_paper_comparison,
    plot_rpe_boxplot,
    segment_by_floor_height,
)


def _fake_eval_results():
    return {
        "orb_slam3": {
            "5th_floor": {
                "endpoint_drift": 0.5,
                "paper_ate": 0.516,
                "rpe_1m": {"rmse": 1.2, "mean": 1.0},
            },
            "2nd_floor": {
                "endpoint_drift": 0.3,
                "paper_ate": 0.310,
                "rpe_1m": {"rmse": 0.9, "mean": 0.8},
            },
        },
        "droid_slam": {
            "5th_floor": {
                "endpoint_drift": 0.4,
                "paper_ate": 0.441,
                "rpe_1m": {"rmse": 0.7, "mean": 0.6},
            },
            "2nd_floor": {"endpoint_drift": 0.2, "paper_ate": 0.214},
        },
    }


def test_rpe_boxplot(tmp_path):
    p = plot_rpe_boxplot(_fake_eval_results(), tmp_path / "rpe.png")
    assert p.exists() and p.stat().st_size > 1000


def test_paper_comparison_bars(tmp_path):
    p = plot_paper_comparison(_fake_eval_results(), tmp_path / "cmp.png")
    assert p.exists() and p.stat().st_size > 1000


def test_all_floors_overview(tmp_path, rng):
    trajs = {}
    for i, floor in enumerate(["5th_floor", "1st_floor", "4th_floor"]):
        n = 50
        t = np.arange(n) * 0.5
        pos = np.cumsum(rng.normal(scale=0.3, size=(n, 3)), axis=0)
        trajs[floor] = np.column_stack(
            [t, pos, np.zeros((n, 3)), np.ones(n)]
        )
    trajs["2nd_floor"] = None  # missing-floor panel
    p = plot_all_floors_overview(
        trajs, tmp_path / "all_floors.png",
        paper_values={"5th_floor": {"length_m": 187, "ate_m": 0.395}},
    )
    assert p.exists() and p.stat().st_size > 1000


def test_segment_by_floor_height():
    z = np.concatenate([np.zeros(10), np.full(10, 4.5), np.full(10, 18.0)])
    pos = np.column_stack([np.arange(30), np.arange(30), z])
    segs = segment_by_floor_height(
        pos, {"1st_floor": 0.0, "2nd_floor": 4.5, "5th_floor": 18.0}
    )
    assert set(segs) == {"1st_floor", "2nd_floor", "5th_floor"}
    assert segs["1st_floor"].sum() == 10
    assert np.all(np.nonzero(segs["5th_floor"])[0] >= 20)


def test_detect_loop_closure_events():
    n = 400
    t = np.linspace(0, 4 * np.pi, n)
    base = np.column_stack([np.cos(t) * 10, np.sin(t) * 10, np.zeros(n)])
    with_lc = base.copy()
    # a loop-closure correction: second revolution snapped onto the first
    with_lc[250:] += np.array([8.0, 0.0, 0.0])
    events = detect_loop_closure_events(
        with_lc, base, jump_threshold=2.0, proximity=3.0, min_index_gap=50
    )
    assert len(events) > 0
    for a, b in events:
        assert abs(a - b) > 50
        assert np.linalg.norm(with_lc[a] - with_lc[b]) < 3.0
    # identical trajectories -> no events; length mismatch -> empty
    assert detect_loop_closure_events(base, base) == []
    assert detect_loop_closure_events(base[:-1], base) == []


def test_figure6_lc_pair(tmp_path):
    """Figure 6 LC/no-LC pair: floors stacked correctly without LC, merged
    with LC, inferred incorrect constraints drawn
    (reference generate_paper_figures.py:125-232)."""
    from mlis_tpu.viz.paper_figures import generate_figure6_lc_pair

    n = 600
    t = np.linspace(0, 6 * np.pi, n)
    xy = np.column_stack([10 * np.cos(t), 6 * np.sin(t)])
    z = np.repeat([0.0, 4.5, 18.0], n // 3)
    no_lc = np.column_stack([xy, z])
    with_lc = no_lc.copy()
    # perceptual aliasing: the 5th-floor leg snapped down onto the 1st
    with_lc[2 * (n // 3):, 2] = 0.3

    p = generate_figure6_lc_pair(no_lc, with_lc, tmp_path / "fig6pair.png")
    assert p.exists() and p.stat().st_size > 5000
    # single-trajectory form (panel (a) only) also works
    p1 = generate_figure6_lc_pair(no_lc, None, tmp_path / "fig6a.png")
    assert p1.exists()


def test_interactive_3d_html(tmp_path, rng):
    n = 300
    tum = np.column_stack(
        [
            np.arange(n) * 0.5,
            np.cumsum(rng.normal(size=(n, 3)), axis=0),
            np.zeros((n, 3)),
            np.ones(n),
        ]
    )
    floors = np.repeat([1, 2, 5], n // 3)
    links = [(5, 205), (10, 60)]
    p = export_interactive_3d_html(
        tum, floors, tmp_path / "traj.html", link_pairs=links
    )
    html = p.read_text()
    assert "<canvas" in html and "Floor 1" in html and "Floor 5" in html
    assert html.count('"valid"') == 2  # both links embedded
    assert '"valid": false' in html  # (5, 205) crosses floors 1 -> 5
    assert '"valid": true' in html  # (10, 60) stays on floor 1


def test_foxglove_layout_generation(tmp_path):
    """Live-visualization layouts (viz/live.py): reference config/foxglove
    parity (LeGO-LOAM 3D + ORB-SLAM3 stereo) plus the gating monitor."""
    import json

    from mlis_tpu.viz.live import LAYOUTS, save_layout

    for name in LAYOUTS:
        out = tmp_path / f"{name}.json"
        d = save_layout(name, str(out))
        j = json.loads(out.read_text())
        assert j == d
        assert {"layout", "playbackConfig", "configById"} <= set(j)

    lego = json.dumps(save_layout("lego_loam", str(tmp_path / "l.json")))
    assert "/ouster/points" in lego and "/aft_mapped_to_init" in lego
    orb = json.dumps(save_layout("orb_slam3", str(tmp_path / "o.json")))
    assert "/camera_array/cam1/image_raw" in orb
    gate = json.dumps(save_layout("gating_monitor", str(tmp_path / "g.json")))
    assert "/mlis/floor_label" in gate and "linear_acceleration.z" in gate
