"""VQ leaderboard-style inference + scoring CLI.

Equivalent of the reference's 3-stage VQ pipeline
(VQ/inference_predict.py -> VQ/inference_results.py -> VQ/evaluate.py,
SURVEY.md §3.5): sliding-window per-frame prediction, score-curve peak
finding into response tracks, then the official metrics. The reference fans
out per-clip tasks over a torch.multiprocessing worker pool (2 per GPU);
here windows are batched through one jitted step — scale comes from the
device mesh, not host processes.

  python -m vilco_tpu.bin.vq_infer --workdir ./runs/vq --synthetic
"""

from __future__ import annotations

import argparse
import glob
import json
import logging
import os
import sys


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", required=True)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--num-tasks", type=int, default=2)
    args = p.parse_args(argv)
    logging.basicConfig(level=logging.INFO, stream=sys.stdout)

    import numpy as np
    import jax
    import jax.numpy as jnp

    from vilco_tpu.core.checkpoint import load_checkpoint
    from vilco_tpu.tasks.vq import (
        SyntheticVQSource,
        VQEpisodeRunner,
        VQTaskStream,
        make_synthetic_vq_split,
    )

    rng = np.random.default_rng(0)
    train, val = make_synthetic_vq_split(rng, num_tasks=args.num_tasks)
    stream = VQTaskStream(train, val)
    src = SyntheticVQSource()
    runner = VQEpisodeRunner(stream, src, args.workdir)

    ckpts = sorted(glob.glob(os.path.join(args.workdir, "vq_task_*.ckpt")))
    if ckpts:
        tree = load_checkpoint(ckpts[-1])
        runner.params = jax.tree.map(jnp.asarray, tree["params"])
        j = int(tree["task"])
    else:
        j = stream.num_tasks - 1

    results = runner.evaluate(j)
    print(json.dumps(results, indent=2, default=float))
    return results


if __name__ == "__main__":
    main()
