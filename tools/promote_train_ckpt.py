"""Promote a periodic training checkpoint to the eval checkpoint name.

``tfci train`` saves its final params to ``<model>.msgpack`` only on normal
completion; periodic saves go to ``<model>.train.msgpack`` (which also
carries optimizer state).  A deadline-killed run therefore leaves no eval
checkpoint.  This tool strips the optimizer state from the latest periodic
save and writes the params+step blob under the eval name, so bounded
(timeout'd) training runs still produce an evaluable model.

Usage: python tools/promote_train_ckpt.py <model-name> [--force]
  Promotes $TPC_MODEL_DIR/<stem>.train.msgpack -> <stem>.msgpack, but only
  if the eval checkpoint is missing or older than the training checkpoint
  (pass --force to overwrite regardless).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def promote(name: str, force: bool = False) -> bool:
    from flax import serialization

    from compression_tpu.cli import registry

    dst = registry.checkpoint_path(name)
    src = dst[: -len(".msgpack")] + ".train.msgpack"
    if not os.path.exists(src):
        print(f"no training checkpoint at {src}; nothing to promote")
        return False
    if (
        not force
        and os.path.exists(dst)
        and os.path.getmtime(dst) >= os.path.getmtime(src)
    ):
        print(f"{dst} is current (newer than {src}); not promoting")
        return False
    with open(src, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    state = {"params": raw["params"], "step": raw.get("step", 0)}
    blob = serialization.msgpack_serialize(state)
    tmp = f"{dst}.tmp{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, dst)
    print(f"promoted {src} (step {state['step']}) -> {dst}")
    return True


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--force"]
    promote(args[0], force="--force" in sys.argv)
