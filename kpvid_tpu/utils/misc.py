from __future__ import annotations

from pathlib import Path


def touch_dir(target_dir: str | Path) -> Path:
    """Create a directory (and parents) if missing; return it."""
    p = Path(target_dir)
    p.mkdir(parents=True, exist_ok=True)
    return p
