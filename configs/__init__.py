"""Named presets, one per judged config (BASELINE.json:7-11; SURVEY.md §5.6).

Each module defines `get_config() -> SlamConfig` (static/hashable — safe as
a jit static argument) plus an `ENTRY` dict naming the script that runs it.

    from configs import load_preset
    cfg, entry = load_preset("kitti00_mono_500")
"""

import importlib


PRESETS = (
    "synthetic_mini",        # config 1 stand-in, no external data
    "kitti00_mono_500",      # config 1 (BASELINE.json:7)
    "kitti00_slam",          # configs 2+3 (BASELINE.json:8-9)
    "euroc_mh01_stereo",     # config 4 (BASELINE.json:10)
    "multisession_kitti",    # config 5 (BASELINE.json:11)
)


def load_preset(name: str):
    if name not in PRESETS:
        raise KeyError(f"unknown preset {name!r}; have {PRESETS}")
    mod = importlib.import_module(f"configs.{name}")
    return mod.get_config(), getattr(mod, "ENTRY", {})
