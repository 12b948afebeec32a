"""Dev-loop harness: state-preserving reload and source-watching restart.

Capability parity with the reference's signature resilience feature
(SURVEY.md section 2 item 19): the reference kept its State alive across
ghci ``:reload`` in a Foreign.Store slot (ref Main.hs:1188-1260), guarded
by a Generics-derived structural fingerprint that REFUSES restoring state
across incompatible type changes (ref Main.hs:1207-1238), and its
compiled binary polled its own mtime and restarted when rebuilt
(ref Main.hs:1119-1121).

The Python equivalents:
  * ``store_state``/``get_state`` — a module-level store that survives
    ``reload_framework()`` (importlib-based module reload).
  * The stored state carries the checkpoint SCHEMA FINGERPRINT; if a
    reload changed the persisted dataclasses, the store refuses to hand
    the stale object back (same safety property, without segfaults to
    motivate it).
  * ``run_watched(cmd)`` — re-run a CLI command whenever package sources
    change (the self-restart poller).
"""

from __future__ import annotations

import importlib
import sys
import time
from pathlib import Path
from typing import Any, Callable, Dict, Optional

# The Foreign.Store analogue: survives reload_framework because THIS
# module is deliberately excluded from reloading.
_STORE: Dict[str, Any] = {}


def store_state(state: Any, slot: str = "scene") -> None:
    from housescan_tpu.io.checkpoint import schema_fingerprint

    _STORE[slot] = (schema_fingerprint(), state)


def get_state(slot: str = "scene") -> Optional[Any]:
    """The stored state, or None if nothing stored OR the schema changed
    since it was stored (refuse-unsafe-restore, ref Main.hs:1213-1215:
    'works even when a field is renamed')."""
    from housescan_tpu.io.checkpoint import schema_fingerprint

    entry = _STORE.get(slot)
    if entry is None:
        return None
    fingerprint, state = entry
    if fingerprint != schema_fingerprint():
        print(
            "devloop: schema fingerprint changed; refusing to restore stale "
            "state (save/load a checkpoint to migrate)",
            file=sys.stderr,
        )
        return None
    return state


def reload_framework(verbose: bool = False) -> int:
    """Reload every housescan_tpu module (except this one). Returns the
    number of modules reloaded. State in the store survives; fetch it
    back with get_state()."""
    names = [
        n
        for n in sorted(sys.modules)
        if n.startswith("housescan_tpu") and not n.startswith("housescan_tpu.devloop")
    ]
    count = 0
    for name in reversed(names):  # children before parents
        mod = sys.modules.get(name)
        if mod is None:
            continue
        try:
            importlib.reload(mod)
            count += 1
            if verbose:
                print(f"reloaded {name}")
        except Exception as e:  # pragma: no cover - depends on edit state
            print(f"devloop: failed to reload {name}: {e}", file=sys.stderr)
    return count


def _source_mtime(root: Path) -> float:
    latest = 0.0
    for p in root.rglob("*.py"):
        try:
            latest = max(latest, p.stat().st_mtime)
        except OSError:
            pass
    return latest


def run_watched(
    fn: Callable[[], Any],
    poll_seconds: float = 1.0,
    root: Optional[Path] = None,
    max_runs: Optional[int] = None,
) -> None:
    """Run ``fn``, then re-run it (after reloading the framework) whenever
    a package source file changes — the exe-mtime self-restart poller
    (ref Main.hs:1119-1121) as a dev loop."""
    root = root or Path(__file__).resolve().parents[1]
    runs = 0
    last = _source_mtime(root)
    fn()
    runs += 1
    while max_runs is None or runs < max_runs:
        time.sleep(poll_seconds)
        now = _source_mtime(root)
        if now > last:
            last = now
            print("devloop: sources changed; reloading + rerunning", file=sys.stderr)
            reload_framework()
            fn()
            runs += 1
