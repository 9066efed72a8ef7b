"""Exercise the wandb-gated code paths with a fake wandb module.

The wandb package is not in this image, so the gated branches in
utils/wandb_utils.py normally never run. A mock module installed into
sys.modules makes them importable and asserts the reference semantics
(/root/reference/scripts/utils/wandb_utils.py:95-120): Api().run(path),
file iteration, download of the matching weight file, and wandb.init for
run logging. VERDICT r2 task 10.
"""
import sys
import types
from pathlib import Path

import pytest


class _FakeFile:
    def __init__(self, name, root_contents=b"ckpt-bytes"):
        self.name = name
        self._contents = root_contents

    def download(self, root=".", replace=False):
        out = Path(root) / self.name
        out.parent.mkdir(parents=True, exist_ok=True)
        out.write_bytes(self._contents)
        return out


class _FakeRun:
    def __init__(self, path, files):
        self.path = path
        self._files = files

    def files(self):
        return list(self._files)


class _FakeApi:
    calls = []

    def run(self, run_path):
        _FakeApi.calls.append(run_path)
        return _FakeRun(run_path, [_FakeFile("logs.txt"), _FakeFile("weights/best.ckpt")])


@pytest.fixture()
def fake_wandb(monkeypatch):
    mod = types.ModuleType("wandb")
    mod.Api = _FakeApi
    mod.init_calls = []

    def _init(**kwargs):
        mod.init_calls.append(kwargs)
        run = types.SimpleNamespace(
            log=lambda *a, **k: None, finish=lambda: None, summary={}
        )
        return run

    mod.init = _init
    monkeypatch.setitem(sys.modules, "wandb", mod)
    _FakeApi.calls = []
    return mod


def test_wandb_available_with_mock(fake_wandb):
    from ayolov2_tpu.utils.wandb_utils import wandb_available

    assert wandb_available()


def test_download_from_wandb_fetches_best_ckpt(fake_wandb, tmp_path):
    from ayolov2_tpu.utils.wandb_utils import download_from_wandb

    got = download_from_wandb("j-marple/AYolov2/1gxaqgk4", out_dir=str(tmp_path))
    assert got is not None and got.endswith("best.ckpt")
    assert Path(got).read_bytes() == b"ckpt-bytes"
    assert _FakeApi.calls == ["j-marple/AYolov2/1gxaqgk4"]


def test_get_ckpt_path_resolves_run_path(fake_wandb, tmp_path, monkeypatch):
    from ayolov2_tpu.utils import wandb_utils

    monkeypatch.chdir(tmp_path)
    # local file passes through untouched
    local = tmp_path / "model.ckpt"
    local.write_bytes(b"x")
    assert wandb_utils.get_ckpt_path(str(local)) == str(local)
    # run path goes through the download branch
    got = wandb_utils.get_ckpt_path("j-marple/AYolov2/33cxs5tn")
    assert got.endswith("best.ckpt") and Path(got).exists()


def test_init_run_calls_wandb_init(fake_wandb):
    from ayolov2_tpu.utils.wandb_utils import init_run

    run = init_run(project="p", name="n", config={"a": 1})
    assert run is not None
    assert fake_wandb.init_calls == [{"project": "p", "name": "n", "config": {"a": 1}}]
