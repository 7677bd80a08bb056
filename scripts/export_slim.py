"""Slim-export a train checkpoint: params(+batch_stats) only, no opt state.

    python scripts/export_slim.py <ckpt_or_manager_dir> <out_dir>

Keeps committed artifacts small (a YOLO-s train state is ~78 MB with opt
state; params are ~25 MB) and loadable by eval/system._restore_tree, which
accepts both manager dirs and these slim dirs.
"""

from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    src, dst = sys.argv[1], sys.argv[2]
    import jax

    jax.config.update("jax_platforms", "cpu")
    import orbax.checkpoint as ocp

    from mtgvision_tpu.eval.system import _restore_tree

    tree = _restore_tree(src)
    slim = {k: v for k, v in tree.items() if v is not None}
    out = pathlib.Path(dst).resolve()
    if out.exists():
        raise SystemExit(f"{out} already exists; refusing to overwrite")
    ocp.PyTreeCheckpointer().save(str(out), slim)
    n = sum(x.size for x in jax.tree.leaves(slim))
    print(f"exported {src} -> {out} ({n/1e6:.1f}M params)")


if __name__ == "__main__":
    main()
