"""Config system: defaults mirror the reference's constants; overrides work."""

import json

import pytest

from tpuseg.configs import Config, load_config


def test_defaults_match_reference():
    cfg = Config()
    assert (cfg.data.width, cfg.data.height) == (256, 128)  # main.py:23
    assert cfg.train.batch_size == 8                        # main.py:92
    assert cfg.train.lr == 1.5e-4                           # main.py:100
    assert cfg.train.epochs == 200                          # main.py:103
    assert cfg.model.num_classes == 10                      # main.py:98
    assert cfg.data.mix == (0.5, 0.2, 0.3)                  # main.py:69-71


def test_dotted_overrides():
    cfg = load_config(["--train.lr=3e-4", "--model.name=unet", "--mesh.data=4"])
    assert cfg.train.lr == 3e-4
    assert cfg.model.name == "unet"
    assert cfg.mesh.data == 4


def test_bool_and_tuple_coercion():
    cfg = load_config(
        ["--train.resume=true", "--data.mix=[0.6,0.2,0.2]"]
    )
    assert cfg.train.resume is True
    assert cfg.data.mix == (0.6, 0.2, 0.2)


def test_scalar_tuple_field_coerces_to_singleton():
    """--train.class_weights=2 (single value, no comma) must become (2.0,)
    instead of a bare int that crashes later in Trainer._build_loss
    (ADVICE r2)."""
    cfg = load_config(["--train.class_weights=2"])
    assert cfg.train.class_weights == (2.0,)
    cfg = load_config(["--train.class_weights=1.5"])
    assert cfg.train.class_weights == (1.5,)


def test_unknown_key_raises():
    with pytest.raises(KeyError):
        load_config(["--train.batchsize=4"])
    with pytest.raises(KeyError):
        load_config(["--trian.lr=1"])


def test_config_file_plus_override(tmp_path):
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps({
        "model": {"name": "unet", "base_filters": 16},
        "data": {"sources": [{"kind": "synthetic", "num_samples": 4}]},
    }))
    cfg = load_config([f"--config={p}", "--model.base_filters=8"])
    assert cfg.model.name == "unet"
    assert cfg.model.base_filters == 8
    assert cfg.data.sources[0].kind == "synthetic"


def test_sources_flag_validation():
    # A bare string (not JSON) must fail loudly, not crash later in
    # build_source with an AttributeError.
    with pytest.raises(ValueError, match="JSON list of objects"):
        load_config(["--data.sources=synthetic:16"])
    with pytest.raises(ValueError, match="JSON list of objects"):
        load_config(['--data.sources=["synthetic"]'])
    good = load_config(
        ['--data.sources=[{"kind":"synthetic","num_samples":16,"weight":1.0}]']
    )
    assert good.data.sources[0].kind == "synthetic"
    assert good.data.sources[0].num_samples == 16
    # A single JSON object is accepted as a one-source shorthand.
    single = load_config(['--data.sources={"kind":"synthetic"}'])
    assert len(single.data.sources) == 1


def test_env_platform_override(monkeypatch):
    """JAX_PLATFORMS=cpu in the env is explicit user intent to stay off the
    chip, but the axon plugin re-pins the backend to the TPU regardless of
    the env — so the CLIs route a cpu-FIRST env value through jax.config
    (the override that actually wins). --platform still takes precedence."""
    from tpuseg.core.platform import env_platform_override

    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    assert env_platform_override() == "cpu"
    monkeypatch.setenv("JAX_PLATFORMS", "cpu,axon")
    assert env_platform_override() == "cpu"
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    assert env_platform_override() is None
    monkeypatch.setenv("JAX_PLATFORMS", "axon,cpu")
    assert env_platform_override() is None
    monkeypatch.delenv("JAX_PLATFORMS")
    assert env_platform_override() is None
