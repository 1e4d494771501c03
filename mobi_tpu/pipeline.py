"""The end-to-end inpainting pipeline, single-device or dp-sharded.

One definition of the reference's inference loop
(/root/reference/scripts/inference_test_bench.py:407-461: conditioning
encode -> VAE encodes -> CFG-doubled denoising loop -> VAE decodes) shared
by bench.py, scripts/inference_test_bench.py, and tests.

The reference samples on exactly one GPU; here the same jitted program can
run dp-sharded over a `jax.sharding.Mesh` of N chips: parameters are
replicated, the (camera, lidar)-pair batch axis is sharded whole-pairs-per-
device (mesh.shard_batch), and the CFG concat's doubled batch keeps whole
pairs per shard because every shard's sub-batch doubles locally. XLA inserts
the (cheap, ICI-riding) collective-permutes for the concat/split; everything
else is embarrassingly batch-parallel.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax

Params = Any


def _split_pairs(tree, n_chunks: int):
    """[B, ...] leaves -> [n_chunks, B // n_chunks, ...]."""
    return jax.tree.map(
        lambda x: x.reshape((n_chunks, x.shape[0] // n_chunks) + x.shape[1:]),
        tree,
    )


def _merge_pairs(tree):
    """Undo _split_pairs: [n, c, ...] -> [n*c, ...]."""
    return jax.tree.map(lambda x: x.reshape((-1,) + x.shape[2:]), tree)


def make_inpaint_pipeline(
    model,
    num_steps: int = 50,
    guidance_scale: float = 5.0,
    sampler: str = "ddim",
    eta: float = 0.0,
    encoder_interval: int = 1,
    mesh=None,
    replicate_outputs: bool = False,
    vae_chunk_pairs: int = 0,
    deterministic_encode: bool = False,
    sample_segments: int = 1,
):
    """jit(get_input -> sample -> decode_sample).

    mesh=None: the plain single-device program. With a mesh, feed the
    returned fn params placed via `replicate_params` and batches placed via
    `mesh.shard_batch`; outputs stay batch-sharded unless
    `replicate_outputs` (multi-process callers that fetch on rank 0 need
    them replicated).

    vae_chunk_pairs > 0 runs the VAE encode (get_input) and decode stages in
    `lax.map` chunks of that many (camera, lidar) pairs. Per-sample math is
    unchanged (no cross-sample reductions anywhere in those stages; the
    interleaved pair order is preserved because chunks are contiguous pair
    slices), but the stages' HBM temporaries shrink by ~batch/chunk — they,
    not the UNet scan, set the whole pipeline's peak (PROFILE.md
    "batch_pairs >= 22 ... HBM OOM": 12.0 GB at batch 20, ~9.5 GB of it VAE),
    so chunking buys the scan a larger batch on the same chip. The
    stochastic posterior draw consumes per-chunk fold_in keys, so samples
    differ from the unchunked program by a different-noise draw only
    (`deterministic_encode=True` pins posterior MODE encodes for exact
    chunked-vs-unchunked parity, which the tests assert). Single-device
    only — with a mesh the batch axis is already device-sharded.

    sample_segments > 1 (exact ddim or plms) dispatches the denoising
    loop as that many separate device programs of ~num_steps/segments
    scanned steps each instead of one monolithic program — returns a
    `SegmentedInpaint` (callable with the same signature, plus
    `.preflight()`). Use when ONE execute would exceed the runtime's
    per-program execute-time limit (PROFILE.md: the tunneled v5e kills
    executes somewhere in (59 s, 103 s] — the real cause of the historical
    "batch_pairs >= 22 device fault", alongside the genuine HBM overrun at
    22 unchunked). The trajectory math is unchanged: the same scan body
    runs over operand-sliced step tables, so outputs match the monolithic
    program (tested). DDIM segments all share ONE compiled executable; PLMS
    carries its Adams-Bashforth eps history ring across segment boundaries
    as an operand (plms.py:221-237 semantics) and compiles at most TWO
    (step 0's double-eval prologue lives in the prep program, so the first
    segment scans one step fewer). Composes with `mesh` (each segment is an
    SPMD program over the dp-sharded batch; step tables replicated) —
    `.preflight()` is then a documented no-op.
    """
    if vae_chunk_pairs and mesh is not None:
        raise ValueError("vae_chunk_pairs is a single-device HBM lever; "
                         "with a mesh the batch is already sharded")
    if sample_segments > 1:
        if sampler not in ("ddim", "plms") or encoder_interval > 1:
            raise ValueError(
                "sample_segments requires the exact ddim or plms path"
            )
        if num_steps % sample_segments:
            raise ValueError(
                f"num_steps={num_steps} not divisible by sample_segments="
                f"{sample_segments} (segments must share one executable)"
            )

    def get_input_full(params, batch, k1):
        return model.get_input(
            params, batch, k1, encode_cond=True,
            deterministic=deterministic_encode,
        )

    def get_input_chunked(params, batch, k1):
        b = jax.tree.leaves(batch)[0].shape[0]
        if b % vae_chunk_pairs:
            raise ValueError(
                f"batch of {b} pairs not divisible by vae_chunk_pairs="
                f"{vae_chunk_pairs}"
            )
        n = b // vae_chunk_pairs
        if n <= 1:
            return get_input_full(params, batch, k1)

        def enc(args):
            chunk, key = args
            d = get_input_full(params, chunk, key)
            # lidar_geom is static Python shape math (identical for every
            # chunk) — keep it out of the mapped pytree and recompute once
            d.pop("lidar_geom", None)
            return d

        keys = jax.random.split(k1, n)
        data = _merge_pairs(
            jax.lax.map(enc, (_split_pairs(batch, n), keys))
        )
        if "z_lidar_full" in data:
            data["lidar_geom"] = model.lidar_latent_geometry(
                data["z_lidar_full"].shape
            )
        return data

    def decode_chunked(params, latents, z_lidar_full, geom):
        n = latents.shape[0] // (
            vae_chunk_pairs * (2 if model.config.multimodal else 1)
        )
        if n <= 1:
            return model.decode_sample(params, latents, z_lidar_full, geom)

        if z_lidar_full is None:
            return _merge_pairs(jax.lax.map(
                lambda s: model.decode_sample(params, s, None, geom),
                _split_pairs(latents, n),
            ))
        return _merge_pairs(jax.lax.map(
            lambda args: model.decode_sample(params, args[0], args[1], geom),
            (_split_pairs(latents, n), _split_pairs(z_lidar_full, n)),
        ))

    decode_fn = decode_chunked if vae_chunk_pairs else model.decode_sample
    if sample_segments > 1:
        return SegmentedInpaint(
            model, num_steps, guidance_scale, eta, sample_segments,
            get_input_chunked if vae_chunk_pairs else get_input_full,
            decode_fn, mesh=mesh, replicate_outputs=replicate_outputs,
            sampler=sampler,
        )

    def pipeline(params, batch: Dict[str, Any], rng: jax.Array):
        k1, k2 = jax.random.split(rng)
        if vae_chunk_pairs:
            data = get_input_chunked(params, batch, k1)
        else:
            data = get_input_full(params, batch, k1)
        latents = model.sample(
            params, data, k2, num_steps=num_steps,
            guidance_scale=guidance_scale, sampler=sampler, eta=eta,
            encoder_interval=encoder_interval,
        )
        return decode_fn(
            params, latents, data.get("z_lidar_full"), data.get("lidar_geom")
        )

    out_shardings = None
    if mesh is not None and replicate_outputs:
        from jax.sharding import NamedSharding, PartitionSpec as P

        out_shardings = NamedSharding(mesh, P())
    return jax.jit(pipeline, out_shardings=out_shardings)


class SegmentedInpaint:
    """The inpaint pipeline as prep / K sampling segments / decode programs.

    Same math as the monolithic jit (the prep stage mirrors
    MobiDiffusion.sample's rng plumbing exactly — diffusion.py `sample`;
    the segment body is samplers.ddim_scan_segment or plms_scan_segment,
    the same scanned steps), but no single device program runs longer than
    ~num_steps/K denoising steps: the tunneled runtime's per-execute time
    limit (PROFILE.md) caps a monolithic DDIM-50 at ~20 batch pairs on the
    v5e, while segments keep every execute short at any batch size.

    DDIM segments carry (x, rng) and share ONE compiled executable (step
    tables are operands). PLMS (plms.py:174-239 semantics) carries its
    Adams-Bashforth eps-history ring (x, hist[3, ...]) across segment
    boundaries as operands; step 0's pseudo-improved-Euler double
    evaluation (plms.py:221-226) runs inside the prep program, so the
    first segment scans one step fewer and the seg program compiles at
    most TWO shapes. All K+2 dispatches are async, so the device queue
    stays full and the host adds no serialization.

    Callable like the jitted pipeline; `preflight()` AOT-compiles the
    programs and HBM-checks each (utils/hbm.py).
    """

    def __init__(self, model, num_steps, guidance_scale, eta, segments,
                 get_input_fn, decode_fn, mesh=None,
                 replicate_outputs: bool = False, sampler: str = "ddim"):
        import jax.numpy as jnp

        from mobi_tpu.models.samplers import (
            ddim_scan_segment,
            plms_per_step_tables,
            plms_prologue,
            plms_scan_segment,
        )
        from mobi_tpu.ops.schedules import SamplerTables

        tables = SamplerTables.create(model.schedule, num_steps, eta=eta)
        m = num_steps // segments
        if sampler == "plms":
            # row 0 (the prologue) runs in prep; rows 1..S-1 are scanned
            per_step = plms_per_step_tables(tables)
            bounds = [(0, m - 1)] + [
                (m - 1 + i * m, m - 1 + (i + 1) * m)
                for i in range(segments - 1)
            ]
        else:
            per_step = (
                tables.timesteps,
                tables.alphas,
                tables.alphas_prev,
                tables.sqrt_one_minus_alphas,
                tables.sigmas,
            )
            bounds = [(i * m, (i + 1) * m) for i in range(segments)]
        self._slices = [
            jax.tree.map(lambda a, lo=lo, hi=hi: a[lo:hi], per_step)
            for lo, hi in bounds
            if hi > lo  # plms with num_steps == segments: empty 1st segment
        ]
        self._dev_slices = None
        self._model = model
        self._mesh = mesh
        self._sampler = sampler

        # Under a mesh, pin every batch-dim array that crosses a segment
        # boundary to the dp batch sharding: materialized jit outputs are
        # otherwise free for the compiler to lay out per program, which
        # (a) can silently all-gather the latents between segments and
        # (b) changes the per-device compute tiling vs the monolithic SPMD
        # program (measured ~2e-4 output drift on the CPU mesh without the
        # constraint vs ~1e-6 with it).
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from mobi_tpu.parallel.mesh import batch_sharding

            _bsh = batch_sharding(mesh)
            # the plms history ring stacks eps on a leading axis of 3 — its
            # batch axis is axis 1
            _hsh = NamedSharding(mesh, P(None, ("dp", "fsdp")))

            def shard_b(a):
                return None if a is None else (
                    jax.lax.with_sharding_constraint(a, _bsh)
                )

            def shard_h(a):
                return jax.lax.with_sharding_constraint(a, _hsh)
        else:
            def shard_b(a):
                return a

            def shard_h(a):
                return a

        def prep(params, batch, rng):
            k1, k2 = jax.random.split(rng)
            data = get_input_fn(params, batch, k1)
            z = data["z"]
            rest = z[..., 4:]
            cond = data["cond"]
            uncond = (
                model.uncond_tokens(params, z.shape[0])
                if guidance_scale != 1.0 else None
            )
            k_init, _k_loop = jax.random.split(k2)
            x = jax.random.normal(
                k_init, z[..., :4].shape, dtype=jnp.float32
            )
            if sampler == "plms":
                def model_fn(x9, t, ctx):
                    return model.apply_model(params, x9, t, ctx)

                x, hist = plms_prologue(
                    model_fn, tables, x, cond, rest, uncond, guidance_scale
                )
                carry2 = shard_h(hist)
            else:
                carry2 = _k_loop
            return (shard_b(x), carry2, shard_b(rest),
                    shard_b(cond), shard_b(uncond),
                    shard_b(data.get("z_lidar_full")))

        def seg(params, x, carry2, rest, cond, uncond, sl):
            def model_fn(x9, t, ctx):
                return model.apply_model(params, x9, t, ctx)

            if sampler == "plms":
                x, hist = plms_scan_segment(
                    model_fn, x, carry2, cond, rest, sl, uncond,
                    guidance_scale,
                )
                return shard_b(x), shard_h(hist)
            x, key = ddim_scan_segment(
                model_fn, carry2, x, cond, rest, sl, uncond, guidance_scale,
                1.0, tables.eta_is_zero,
            )
            return shard_b(x), key

        def dec(params, latents, z_lidar_full):
            geom = (
                model.lidar_latent_geometry(z_lidar_full.shape)
                if z_lidar_full is not None else None
            )
            return decode_fn(params, latents, z_lidar_full, geom)

        # with a dp mesh the batch axis is sharded by the caller
        # (shard_batch) and shardings propagate through all three jits;
        # the step tables are replicated. replicate_outputs mirrors the
        # monolithic path's option for multi-process rank-0 fetches.
        dec_out = None
        if mesh is not None and replicate_outputs:
            from jax.sharding import NamedSharding, PartitionSpec as P

            dec_out = NamedSharding(mesh, P())
        self._prep, self._seg, self._dec = (
            jax.jit(prep), jax.jit(seg), jax.jit(dec, out_shardings=dec_out),
        )
        self._prep_c = self._dec_c = None
        self._seg_c: Dict[int, Any] = {}

    def _place_slices(self):
        if self._dev_slices is None:
            if self._mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                self._dev_slices = jax.device_put(
                    self._slices, NamedSharding(self._mesh, P())
                )
            else:
                self._dev_slices = jax.device_put(self._slices)
        return self._dev_slices

    def __call__(self, params, batch: Dict[str, Any], rng: jax.Array):
        prep = self._prep_c or self._prep
        dec = self._dec_c or self._dec
        x, carry2, rest, cond, uncond, zf = prep(params, batch, rng)
        for sl in self._place_slices():
            n = int(sl[0].shape[0])
            seg = self._seg_c.get(n) or self._seg
            x, carry2 = seg(params, x, carry2, rest, cond, uncond, sl)
        return dec(params, x, zf)

    def timed_call(self, params, batch, rng):
        """__call__ with a host-synced wall clock per device program.

        Returns (out, walls) where walls is a list of (name, seconds) for
        prep / each sampling segment / decode. Each program is followed by a
        4-byte scalar fetch of one output leaf — on the tunneled runtime
        `block_until_ready` can resolve before execution finishes (async
        dispatch), but a host read of the result cannot — so each wall is
        ~(device time + one fetch round-trip). Serializes the dispatches, so
        use for diagnosis (bench.py's device-time cross-check), never for
        the throughput measurement itself. The tiny reshape/fetch programs
        compile on first use; run once discarded to warm them before timing.
        """
        import time

        import jax.numpy as jnp

        def sync(tree):
            leaf = next(
                x for x in jax.tree.leaves(tree) if hasattr(x, "reshape")
            )
            _ = float(jnp.reshape(leaf, (-1,))[0])

        walls = []
        prep = self._prep_c or self._prep
        dec = self._dec_c or self._dec
        t = time.perf_counter()
        x, carry2, rest, cond, uncond, zf = prep(params, batch, rng)
        sync(x)
        walls.append(("prep", time.perf_counter() - t))
        for i, sl in enumerate(self._place_slices()):
            n = int(sl[0].shape[0])
            seg = self._seg_c.get(n) or self._seg
            t = time.perf_counter()
            x, carry2 = seg(params, x, carry2, rest, cond, uncond, sl)
            sync(x)
            walls.append((f"seg{i}[{n}]", time.perf_counter() - t))
        t = time.perf_counter()
        out = dec(params, x, zf)
        sync(out)
        walls.append(("decode", time.perf_counter() - t))
        return out, walls

    def preflight(self, params, batch, rng, label="inpaint") -> bool:
        """AOT-compile prep/segment(s)/decode and HBM-check each program's
        plan (utils/hbm.py). Returns True when the checks ran. Subsequent
        calls reuse the compiled executables. Single-device only: under a
        mesh the eval_shape-based lowering would drop the input shardings
        and compile (and cache!) the wrong SPMD program, so the check is
        skipped (False), never wrong."""
        if self._mesh is not None:
            return False
        from mobi_tpu.utils.hbm import assert_fits

        slices = self._place_slices()
        self._prep_c = self._prep.lower(params, batch, rng).compile()
        outs = jax.eval_shape(self._prep, params, batch, rng)
        x, carry2, rest, cond, uncond, zf = outs
        # one executable per distinct segment length (ddim: one; plms: the
        # prologue-bearing first segment is one step shorter -> up to two)
        for sl in slices:
            n = int(sl[0].shape[0])
            if n not in self._seg_c:
                self._seg_c[n] = self._seg.lower(
                    params, x, carry2, rest, cond, uncond, sl
                ).compile()
        self._dec_c = self._dec.lower(params, x, zf).compile()
        ran = [
            assert_fits(c, label=f"{label} ({name})")
            for name, c in (
                [("prep", self._prep_c)]
                + [(f"sampling segment[{n} steps]", c)
                   for n, c in sorted(self._seg_c.items())]
                + [("decode", self._dec_c)]
            )
        ]
        return all(ran)


def replicate_params(mesh, params: Params) -> Params:
    """Pin the parameter tree to every device of a dp inference mesh."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    return jax.device_put(params, NamedSharding(mesh, P()))


def inference_mesh(dp: Optional[int] = None, devices=None):
    """A dp-only mesh over the first `dp` devices (all by default)."""
    from mobi_tpu.parallel.mesh import create_mesh

    devices = list(devices if devices is not None else jax.devices())
    if dp is not None:
        devices = devices[:dp]
    return create_mesh(dp=len(devices), devices=devices)
