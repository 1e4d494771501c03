"""Multi-process worker + shared train-loop math for tests/test_multihost.py.

Run as a subprocess (one per simulated host) it joins a localhost gloo
runtime, builds the global dp mesh over all processes' CPU devices, feeds
its contiguous slice of the deterministic global batch, runs N train steps,
and prints the per-step losses as JSON. The same `run_steps` is imported by
the pytest process to produce the single-process 8-device baseline the
multi-process losses must match (the reference's DDP == single-GPU
gradient-equivalence contract, /root/reference/main.py:510).
"""
import json
import sys


def run_steps(mesh, local_batch, n_steps=2, seed=7):
    """Deterministic tiny-model train loop shared by baseline and workers."""
    import jax

    from mobi_tpu.parallel.mesh import shard_batch, shard_params
    from mobi_tpu.training import create_train_state, make_train_step
    from tests.helpers import perturb_params
    from tests.test_diffusion import tiny_model_and_params

    model, params = tiny_model_and_params()
    params = perturb_params(params)
    state, tx = create_train_state(
        model, jax.random.PRNGKey(0), base_lr=1e-3, params=params
    )
    state = shard_params(mesh, state)
    step_fn = jax.jit(make_train_step(model, tx))
    rng = jax.random.PRNGKey(seed)
    losses = []
    with mesh:
        batch_dev = shard_batch(mesh, local_batch)
        for _ in range(n_steps):
            rng, sub = jax.random.split(rng)
            state, m = step_fn(state, batch_dev, sub)
            losses.append(float(m["loss"]))
    return losses, state


def global_batch(pairs=8):
    from tests.test_diffusion import make_batch

    return make_batch(b=pairs)


def local_slice(batch, shard_index, num_shards):
    import jax

    def cut(x):
        per = x.shape[0] // num_shards
        return x[shard_index * per : (shard_index + 1) * per]

    return jax.tree_util.tree_map(cut, batch)


def main():
    process_id = int(sys.argv[1])
    num_processes = int(sys.argv[2])
    port = sys.argv[3]
    n_steps = int(sys.argv[4])

    from mobi_tpu.parallel import distributed as dist

    assert dist.initialize(f"localhost:{port}", num_processes, process_id)
    import jax

    assert jax.process_count() == num_processes

    import numpy as np

    from mobi_tpu.parallel.mesh import create_mesh

    mesh = create_mesh(devices=jax.devices())  # dp = all global devices
    batch = local_slice(global_batch(), process_id, num_processes)
    losses, state = run_steps(mesh, batch, n_steps=n_steps)

    # gather exercises replicate_to_host (the checkpoint path); hash a
    # param leaf so the test can also assert cross-process state equality
    host_params = dist.replicate_to_host(state.params, mesh)
    leaf = np.asarray(
        jax.tree_util.tree_leaves(host_params["unet"])[0], np.float64
    )
    print("MH_RESULT " + json.dumps({
        "process": process_id,
        "losses": losses,
        "param_probe": float(leaf.sum()),
    }), flush=True)
    dist.barrier("mh_worker_done")


if __name__ == "__main__":
    main()
