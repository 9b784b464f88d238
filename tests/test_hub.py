"""Hub interop surface (io/hub.py) — exercised fully offline.

The reference loads checkpoints by hub repo id and pushes trained models back
(modeling_clip_vision_utils.py:119-396, main.py:322-328); these tests pin
mic_tpu's equivalents: local dirs pass through, repo ids route through
snapshot_download, failures raise actionable errors, and push_to_hub calls
the upload API with the right arguments.
"""

import sys
import types

import pytest

from mic_tpu.io import hub


def test_local_dir_passes_through(tmp_path):
    assert hub.resolve_model_dir(str(tmp_path)) == str(tmp_path)


def test_repo_id_routes_through_snapshot_download(tmp_path, monkeypatch):
    calls = {}

    def fake_snapshot_download(repo_id, revision=None, cache_dir=None,
                               allow_patterns=None):
        calls.update(repo_id=repo_id, revision=revision,
                     allow_patterns=allow_patterns)
        return str(tmp_path / "snap")

    fake = types.SimpleNamespace(snapshot_download=fake_snapshot_download)
    monkeypatch.setitem(sys.modules, "huggingface_hub", fake)
    out = hub.resolve_model_dir("flax-community/some-model", revision="abc")
    assert out == str(tmp_path / "snap")
    assert calls["repo_id"] == "flax-community/some-model"
    assert calls["revision"] == "abc"
    assert "*.msgpack" in calls["allow_patterns"]


def test_unresolvable_raises_actionable_error(monkeypatch):
    def boom(**kw):
        raise ConnectionError("no network")

    fake = types.SimpleNamespace(snapshot_download=boom)
    monkeypatch.setitem(sys.modules, "huggingface_hub", fake)
    with pytest.raises(FileNotFoundError, match="offline"):
        hub.resolve_model_dir("not/a-local-dir")


def test_push_to_hub_calls_upload(tmp_path, monkeypatch):
    (tmp_path / "config.json").write_text("{}")
    seen = {}

    class FakeApi:
        def __init__(self, token=None):
            seen["token"] = token

        def create_repo(self, repo_id, private=False, exist_ok=False):
            seen["create"] = (repo_id, private, exist_ok)
            return f"https://hub/{repo_id}"

        def upload_folder(self, folder_path, repo_id, commit_message):
            seen["upload"] = (folder_path, repo_id, commit_message)

    fake = types.SimpleNamespace(HfApi=FakeApi)
    monkeypatch.setitem(sys.modules, "huggingface_hub", fake)
    url = hub.push_to_hub(str(tmp_path), "me/model", private=True,
                          commit_message="hi", token="tok")
    assert url == "https://hub/me/model"
    assert seen["create"] == ("me/model", True, True)
    assert seen["upload"] == (str(tmp_path), "me/model", "hi")
    assert seen["token"] == "tok"


def test_push_missing_dir_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        hub.push_to_hub(str(tmp_path / "nope"), "me/model")
