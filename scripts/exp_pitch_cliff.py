"""Probe the intermediate-pitch match cliff (QUALITY.md): is it ratio
strictness, band-pitch quantization, or orientation instability?"""
import os, sys, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from functools import partial
from spherical_bundle_adjuster_tpu.core import rotation
from spherical_bundle_adjuster_tpu.models import evaluation
from spherical_bundle_adjuster_tpu.models.frontend import FRONTENDS
from spherical_bundle_adjuster_tpu.utils import synthetic
from spherical_bundle_adjuster_tpu.utils.config import (
    FrontendConfig, MatchConfig, PipelineConfig, SurfConfig)

H, W = 512, 1024
SEEDS = (11, 12, 13)

def run_cell(cfg, euler_deg, fe="band"):
    @partial(jax.jit, static_argnames=())
    def cell(keys, euler):
        R = rotation.euler_to_matrix(euler)
        def one(key):
            left = synthetic.render_erp(key, jnp.eye(3, dtype=jnp.float32), H, W)
            right = synthetic.render_erp(key, R.T, H, W)
            fr = FRONTENDS[fe](left, right, cfg)
            return evaluation.evaluate_matches(fr, R, W, H, cfg)
        return jax.vmap(one)(keys)
    keys = jnp.stack([jax.random.PRNGKey(s) for s in SEEDS])
    ev = cell(keys, jnp.asarray(np.deg2rad(euler_deg), jnp.float32))
    return (float(jnp.mean(ev.num_matches.astype(jnp.float32))),
            float(jnp.mean(ev.outlier_pct)),
            float(jnp.rad2deg(jnp.mean(ev.trimmed_mean_err_rad))))

base = dict(surf=SurfConfig(max_keypoints=256, n_octaves=3),
            match=MatchConfig(max_matches=512, ratio_thresh=0.5))
pitch30 = [0.0, 30.0, 0.0]
pitch15 = [0.0, 15.0, 0.0]

for label, cfg in [
    ("ratio 0.5 (base)", PipelineConfig(**base)),
    ("ratio 0.6", PipelineConfig(surf=base["surf"], match=MatchConfig(max_matches=512, ratio_thresh=0.6))),
    ("ratio 0.7", PipelineConfig(surf=base["surf"], match=MatchConfig(max_matches=512, ratio_thresh=0.7))),
    ("dense bands (22.5 ladder)", PipelineConfig(**base, frontend=FrontendConfig(
        band_pitches_deg=(67.5, 45.0, 22.5, 0.0, -22.5, -45.0, -67.5, -90.0)))),
    ("dense bands + ratio 0.6", PipelineConfig(
        surf=base["surf"], match=MatchConfig(max_matches=512, ratio_thresh=0.6),
        frontend=FrontendConfig(band_pitches_deg=(67.5, 45.0, 22.5, 0.0, -22.5, -45.0, -67.5, -90.0)))),
]:
    m30 = run_cell(cfg, pitch30)
    m15 = run_cell(cfg, pitch15)
    print(f"{label:28s} pitch15: m={m15[0]:5.1f} out%={m15[1]:5.1f} err={m15[2]:6.2f} | "
          f"pitch30: m={m30[0]:5.1f} out%={m30[1]:5.1f} err={m30[2]:6.2f}", flush=True)
