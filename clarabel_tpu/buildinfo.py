"""Build/runtime provenance.

reference: lib.rs:88-114 (vergen buildinfo feature) — reports version and
toolchain details for reproducibility.
"""

from __future__ import annotations

import platform
import subprocess


def buildinfo() -> dict:
    from . import __version__

    info = {
        "version": __version__,
        "python": platform.python_version(),
        "system": platform.platform(),
    }
    try:
        import jax

        info["jax"] = jax.__version__
        info["backends"] = sorted(
            {d.platform for d in jax.devices()}
        )
    except Exception:  # pragma: no cover
        pass
    try:
        rev = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=5,
        )
        if rev.returncode == 0:
            info["git_rev"] = rev.stdout.strip()
    except Exception:  # pragma: no cover
        pass
    from . import native

    info["native_symbolic"] = native.available()
    return info


def print_buildinfo() -> None:  # pragma: no cover - cosmetic
    for k, v in buildinfo().items():
        print(f"{k}: {v}")
