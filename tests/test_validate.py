"""Scene validator + rangenet converter tests (VERDICT r4 item 5).

The validator must pass on the synth writer's reference-layout scenes and
name the exact violated convention on broken ones; the converter must
round-trip a torch darknet-53 backbone state_dict into the flax tree.
"""

import json
import os

import numpy as np
import pytest

from nerf_lidar_tpu.data import synth_nusc
from nerf_lidar_tpu.data import validate as vlib


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("scene") / "nusc"
    synth_nusc.write_scene_dir(str(root), num_frames=4, sensor_num=6,
                               height=45, width=80, seed=0,
                               lidar_points_per_beam=16)
    return str(root)


def test_validator_passes_on_synth_scene(scene_dir):
    rep = vlib.validate_scene(scene_dir)
    errs = [i for i in rep.issues if i.level == "ERROR"]
    assert rep.ok, [str(i) for i in errs]


def test_validator_names_missing_poses(tmp_path):
    rep = vlib.validate_scene(str(tmp_path))
    assert not rep.ok
    msgs = " ".join(str(i) for i in rep.issues)
    assert "poses_bounds.npy" in msgs
    assert "load_nuscenes.py" in msgs  # cites the reference convention


def test_validator_catches_shape_and_count_mismatches(scene_dir, tmp_path):
    import shutil
    broken = tmp_path / "broken"
    shutil.copytree(scene_dir, broken)
    # Wrong poses_bounds width.
    pb = np.load(broken / "poses_bounds.npy")
    np.save(broken / "poses_bounds.npy", pb[:, :17])
    rep = vlib.validate_scene(str(broken))
    assert not rep.ok
    assert any("[N, 19]" in i.message for i in rep.issues)

    # Image-count mismatch.
    np.save(broken / "poses_bounds.npy", pb)
    imgs = sorted(os.listdir(broken / "images"))
    os.remove(broken / "images" / imgs[-1])
    rep = vlib.validate_scene(str(broken))
    assert any("poses_bounds has" in i.message for i in rep.issues)


def test_validator_catches_lidar_layout_errors(scene_dir, tmp_path):
    import shutil
    broken = tmp_path / "broken2"
    shutil.copytree(scene_dir, broken)
    # Truncate a bin to a non-row-multiple size.
    b0 = broken / "lidar_points" / "000000.bin"
    raw = b0.read_bytes()
    b0.write_bytes(raw[: len(raw) - 4])
    # Drop one points%03d.npy.
    os.remove(broken / "lidar_points" / "points001.npy")
    rep = vlib.validate_scene(str(broken))
    msgs = [i.message for i in rep.issues if i.level == "ERROR"]
    assert any("float32 x 5" in m for m in msgs)
    assert any("points%03d.npy" in m for m in msgs)


def test_validator_warns_on_second_unit_timestamps(scene_dir, tmp_path):
    import shutil
    broken = tmp_path / "broken3"
    shutil.copytree(scene_dir, broken)
    t = np.loadtxt(broken / "timestamps.txt")
    np.savetxt(broken / "timestamps.txt", (t - t.min()) / 1e6)  # seconds
    rep = vlib.validate_scene(str(broken))
    assert any("MICROSECONDS" in i.message for i in rep.issues)


def _fake_rangenet_state_dict():
    """Minimal torch state_dict with rangenet.lib darknet-53 names/shapes
    (reference darknet.py:107-148)."""
    import torch
    blocks = (1, 2, 8, 8, 4)
    stages = ((32, 64), (64, 128), (128, 256), (256, 512), (512, 1024))
    sd = {}

    def conv(name, cout, cin, k):
        sd[f"{name}.weight"] = torch.randn(cout, cin, k, k)

    def bn(name, c):
        sd[f"{name}.weight"] = torch.randn(c)
        sd[f"{name}.bias"] = torch.randn(c)
        sd[f"{name}.running_mean"] = torch.randn(c)
        sd[f"{name}.running_var"] = torch.rand(c) + 0.5
        sd[f"{name}.num_batches_tracked"] = torch.tensor(0)

    conv("conv1", 32, 4, 3)
    bn("bn1", 32)
    cin = 32
    for si, (planes, nb) in enumerate(zip(stages, blocks)):
        t = f"enc{si + 1}"
        conv(f"{t}.conv", planes[1], cin, 3)
        bn(f"{t}.bn", planes[1])
        for bi in range(nb):
            r = f"{t}.residual_{bi}"
            conv(f"{r}.conv1", planes[0], planes[1], 1)
            bn(f"{r}.bn1", planes[0])
            conv(f"{r}.conv2", planes[1], planes[0], 3)
            bn(f"{r}.bn2", planes[1])
        cin = planes[1]
    # DataParallel-style prefix on one entry: converter must strip it.
    sd["module.conv1.weight"] = sd.pop("conv1.weight")
    return sd


def test_convert_vgg_roundtrip(tmp_path, capsys):
    torch = pytest.importorskip("torch")
    from nerf_lidar_tpu import cli

    # torchvision VGG19 conv-trunk shapes for the 8 convs the loss uses
    # plus classifier entries the converter must skip.
    chans = [(64, 3), (64, 64), (128, 64), (128, 128), (256, 128),
             (256, 256), (256, 256), (256, 256)]
    idx = [0, 2, 5, 7, 10, 12, 14, 16]
    sd = {}
    for (o, i), n in zip(chans, idx):
        sd[f"features.{n}.weight"] = torch.randn(o, i, 3, 3)
        sd[f"features.{n}.bias"] = torch.randn(o)
    sd["classifier.0.weight"] = torch.randn(8, 8)
    ckpt = tmp_path / "vgg19.pth"
    torch.save(sd, str(ckpt))
    out = tmp_path / "vgg.npz"
    cli.main(["convert_vgg", "--ckpt", str(ckpt), "--out", str(out)])
    assert "flax VGG19 tree OK" in capsys.readouterr().out
    import numpy as np_
    assert "classifier.0.weight" not in np_.load(out).files
    # The converted npz must feed RayDropConfig(vgg_npz=...).
    from nerf_lidar_tpu.raydrop.trainer import RayDropConfig, RayDropTrainer
    RayDropTrainer(RayDropConfig(vgg=True, vgg_npz=str(out)))


def test_convert_rangenet_roundtrip(tmp_path, capsys):
    torch = pytest.importorskip("torch")
    from nerf_lidar_tpu import cli

    ckpt = tmp_path / "backbone"
    torch.save(_fake_rangenet_state_dict(), str(ckpt))
    out = tmp_path / "darknet.npz"
    cli.main(["convert_rangenet", "--backbone", str(ckpt),
              "--out", str(out)])
    assert out.exists()
    assert "loaded into the flax darknet tree OK" in capsys.readouterr().out
    # The converted tree must actually run through the backbone.
    import jax.numpy as jnp
    from nerf_lidar_tpu.raydrop import darknet as dk
    tree = dk.load_torch_darknet_npz(str(out))
    model = dk.DarknetBackbone()
    feats = model.apply(tree, jnp.zeros((1, 32, 64, 4)))
    assert len(feats) == 6
    assert feats[-1].shape == (1, 32, 2, 1024)
