"""AOT serving export: serialize -> deserialize -> bit-equal predictions."""

import numpy as np
import pytest

from few_shot_seg_cwt_tpu.config import load_cfg, merge_cfg_from_list


def _cfg(**over):
    cfg = load_cfg("configs/synthetic_smoke.yaml")
    base = {"image_size": 33, "adapt_iter": 4, "workers": 0, "episode_batch": 2}
    base.update(over)
    opts = []
    for k, v in base.items():
        opts += [k, repr(v) if isinstance(v, str) else str(v)]
    return merge_cfg_from_list(cfg, opts)


def _episode_batch(cfg, e=2, seed=0):
    rng = np.random.default_rng(seed)
    size, shot = cfg.image_size, cfg.shot
    return {
        "s_img": rng.normal(size=(e, shot, size, size, 3)).astype(np.float32),
        "s_label": rng.integers(0, 2, size=(e, shot, size, size)).astype(np.int32),
        "q_img": rng.normal(size=(e, size, size, 3)).astype(np.float32),
    }


def test_export_serve_roundtrip(tmp_path):
    """The serialized artifact reproduces the live engine's masks exactly."""
    import jax
    import jax.export

    from few_shot_seg_cwt_tpu.episodic.engine import EpisodicEngine
    from few_shot_seg_cwt_tpu.tools.export_serve import build_serve_export
    from few_shot_seg_cwt_tpu.train.common import init_backbone, init_cwt

    cfg = _cfg()
    engine = EpisodicEngine(cfg)
    vars_b = init_backbone(cfg, engine)
    vars_t = init_cwt(cfg, engine)

    e = 2
    exported = build_serve_export(cfg, vars_b, vars_t, batch=e)
    blob = exported.serialize()
    path = tmp_path / "serve.jaxexport"
    path.write_bytes(blob)

    batch = _episode_batch(cfg, e=e)
    rngs = np.stack([np.asarray(jax.random.PRNGKey(i)) for i in range(e)])

    live = np.asarray(engine.serve_batch(vars_b, vars_t, batch, rngs))
    restored = jax.export.deserialize(path.read_bytes())
    served = np.asarray(restored.call(batch, rngs))

    assert served.shape == (e, cfg.image_size, cfg.image_size)
    assert served.dtype == np.int32
    assert set(np.unique(served)) <= {0, 1}
    np.testing.assert_array_equal(served, live)


def test_export_serve_cli(tmp_path):
    """The CLI writes a loadable artifact and reports its metadata."""
    import jax.export

    from few_shot_seg_cwt_tpu.tools.export_serve import main

    out = tmp_path / "cli.jaxexport"
    info = main([
        "--config", "configs/synthetic_smoke.yaml",
        "--out", str(out), "--batch", "2",
        "--opts", "image_size", "33", "adapt_iter", "2", "workers", "0",
    ])
    assert info["bytes"] == out.stat().st_size > 0
    restored = jax.export.deserialize(out.read_bytes())
    assert restored.in_avals  # parses back into an Exported
