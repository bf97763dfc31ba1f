"""CLI-level units: the eval --follow checkpoint-polling daemon."""

import os
import threading
import time

from nerf_lidar_tpu.cli import follow_checkpoints
import nerf_lidar_tpu.train.checkpoints  # noqa: F401  (pre-import: the
# daemon lazily imports this; paying it here keeps the timing test honest)


def _touch(d, step):
    with open(os.path.join(d, f"checkpoint_{step}.ckpt"), "wb") as f:
        f.write(b"x")


def test_follow_checkpoints_evaluates_each_new_ckpt(tmp_path):
    d = str(tmp_path)
    seen = []

    def writer():
        for step in (10, 20, 30):
            _touch(d, step)
            time.sleep(0.5)

    t = threading.Thread(target=writer)
    t.start()
    follow_checkpoints(d, seen.append, poll_every=0.05, timeout=5.0,
                       stop_step=30)
    t.join()
    assert seen == [10, 20, 30]


def test_follow_checkpoints_times_out_when_idle(tmp_path):
    d = str(tmp_path)
    _touch(d, 5)
    seen = []
    t0 = time.time()
    follow_checkpoints(d, seen.append, poll_every=0.05, timeout=0.2,
                       stop_step=100)
    assert seen == [5]
    assert time.time() - t0 < 3.0


def test_metrics_logger_tensorboard(tmp_path):
    """--tensorboard mirrors scalars to <exp>/tb via tensorboardX."""
    from nerf_lidar_tpu.utils.logging import MetricsLogger

    lg = MetricsLogger(str(tmp_path), tensorboard=True)
    lg.log(1, loss=0.5, psnr=20.0, note="s")
    lg.log(2, loss=0.4, psnr=21.0)
    if lg.tb is not None:
        lg.tb.flush()
        import glob
        assert glob.glob(str(tmp_path / "tb" / "events.*"))
    lines = open(str(tmp_path / "metrics.jsonl")).read().splitlines()
    assert len(lines) == 2


def test_follow_checkpoints_trusts_returned_step(tmp_path):
    """If eval_fn restores a NEWER checkpoint than detected (trainer saved
    and pruned between detection and restore), the daemon must not
    evaluate that newer checkpoint a second time."""
    d = str(tmp_path)
    _touch(d, 10)
    calls = []

    def eval_fn(detected):
        calls.append(detected)
        if len(calls) == 1:
            # Simulate: trainer wrote 20 and pruned 10; restore got 20.
            os.remove(os.path.join(d, "checkpoint_10.ckpt"))
            _touch(d, 20)
            return 20
        return detected

    follow_checkpoints(d, eval_fn, poll_every=0.05, timeout=1.0,
                       stop_step=20)
    assert calls == [10], calls


def test_config_json_snapshot_roundtrip(tmp_path):
    # --config_json exact-resume: a to_json snapshot rebuilds the identical
    # Config (lists -> declared tuples, nested dataclasses); fields added
    # after the snapshot was written fill from defaults; unknown keys fail
    # loudly instead of half-applying.
    import dataclasses
    import json

    import pytest

    from nerf_lidar_tpu import configs

    cfg = dataclasses.replace(
        configs.nuscenes_single_fast(), exp_name="snap", batch_size=1234,
        pulse_width=(0.05, 0.004))
    d = json.loads(cfg.to_json())
    assert configs.Config.from_dict(d) == cfg

    d_old = json.loads(cfg.to_json())
    del d_old["model"]["nerf_mlp"]["grid"]["fourier_freqs"]  # older snapshot
    got = configs.Config.from_dict(d_old)
    assert got.model.nerf_mlp.grid.fourier_freqs == \
        configs.GridConfig().fourier_freqs

    d_bad = json.loads(cfg.to_json())
    d_bad["no_such_knob"] = 1
    with pytest.raises(ValueError, match="no_such_knob"):
        configs.Config.from_dict(d_bad)

    # CLI plumb-through: build_config honors --config_json + overrides.
    from nerf_lidar_tpu import cli as cli_mod
    p = tmp_path / "config.json"
    p.write_text(cfg.to_json())
    ns = type("A", (), dict(config_json=str(p), set=["batch_size=64"],
                            data_dir=None, exp_name="resumed"))()
    built = cli_mod.build_config(ns)
    assert built.batch_size == 64 and built.exp_name == "resumed"
    assert built.model == cfg.model


def test_pad_obj_latents_zero_fills_new_slots():
    import jax.numpy as jnp
    import numpy as np

    from nerf_lidar_tpu.cli import _pad_obj_latents

    params = {"params": {"obj_latents": jnp.ones((2, 4)), "other": 1}}
    out = _pad_obj_latents(params, 4)
    lat = np.asarray(out["params"]["obj_latents"])
    assert lat.shape == (4, 4)
    np.testing.assert_array_equal(lat[:2], 1.0)
    np.testing.assert_array_equal(lat[2:], 0.0)
    # No-op when the table already covers the slots (and no copy surprises).
    assert _pad_obj_latents(params, 2) is params


def test_raydrop_features_pair_format_error():
    import pytest

    from nerf_lidar_tpu import cli

    with pytest.raises(SystemExit, match="scene_dir:sim_sweep_dir"):
        cli.main(["raydrop_features", "--pair", "/no/colon/here",
                  "--out", "/tmp/x.npy"])


def test_points_vis_variants(tmp_path, capsys):
    """points_vis: .bin + auto-derived labels, class filter, per-class
    dumps, npy transpose handling (nerflidar_related_scripts analogs)."""
    import numpy as np

    from nerf_lidar_tpu import cli
    from nerf_lidar_tpu.lidar import export as export_lib

    rng = np.random.RandomState(0)
    pts = rng.randn(40, 3).astype(np.float32) * 10
    labels = rng.randint(0, 19, 40).astype(np.uint32)
    scene = tmp_path / "seq"
    export_lib.write_bin_label(str(scene), 0, pts, labels)
    binp = scene / "velodyne" / "000000.bin"

    out = tmp_path / "vis"
    cli.main(["points_vis", "--points", f"sim={binp}",
              "--out", str(out), "--classes", "13,14,15"])
    objs = sorted(out.glob("*.obj"))
    assert [o.name for o in objs] == ["sim.obj"]
    n_expect = int(np.isin(labels, [13, 14, 15]).sum())
    assert sum(1 for _ in open(objs[0])) == n_expect

    # per-class with label column appended (gt_label.py analog)
    out2 = tmp_path / "vis2"
    cli.main(["points_vis", "--points", f"x={binp}", "--out", str(out2),
              "--per_class"])
    got = sorted(out2.glob("x_class*.obj"))
    assert len(got) == len(np.unique(labels))
    first = open(got[0]).readline().split()
    assert len(first) == 5  # v x y z label

    # channel-major .npy is transposed on load
    npy = tmp_path / "pts.npy"
    np.save(npy, pts.T)
    loaded = export_lib.load_points_any(str(npy))
    np.testing.assert_allclose(loaded, pts)

    # z_min filter without labels
    out3 = tmp_path / "vis3"
    cli.main(["points_vis", "--points", str(npy), "--out", str(out3),
              "--z_min", "0.0"])
    n = sum(1 for _ in open(out3 / "pts.obj"))
    assert n == int((pts[:, 2] > 0).sum())
    capsys.readouterr()


def test_load_points_any_prefers_width4(tmp_path):
    # A 120,000-float N x 4 .bin (N divisible by 5) must parse as width 4
    # (SemanticKITTI AND this framework's own exports), not width 5 —
    # divisibility alone is ambiguous and 5-first sheared xyz across rows.
    import numpy as np

    from nerf_lidar_tpu.lidar import export as export_lib
    n = 30000  # n % 5 == 0, floats = 120000 divisible by 4 and 5
    pts = np.random.RandomState(0).rand(n, 4).astype(np.float32)
    p = tmp_path / "velodyne.bin"
    pts.tofile(p)
    loaded = export_lib.load_points_any(str(p))
    assert loaded.shape == (n, 3)
    np.testing.assert_allclose(loaded, pts[:, :3])


def test_validate_scene_exit_code(tmp_path):
    # main() must propagate validate_scene's FAIL so shell gating
    # (`validate_scene $SCENE && train`) actually gates.
    import pytest as _pytest

    from nerf_lidar_tpu import cli as cli_mod
    bad = tmp_path / "scene"
    bad.mkdir()
    with _pytest.raises(SystemExit) as ei:
        cli_mod.main(["validate_scene", str(bad)])
    assert ei.value.code == 1
