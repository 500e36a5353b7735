"""Process orchestration: dataset -> init -> train loop -> eval/export.

Counterpart of brush-process (crates/brush-process/src/{lib,train_stream}.rs):
detects view-vs-train sources, drives the jitted train/refine steps, handles
capacity growth (the only recompile points), periodic eval, and ply export.
Emits typed messages a consumer (CLI, viewer service) can stream."""

from __future__ import annotations

import dataclasses
import math
import time
from pathlib import Path
from typing import Callable, Iterator

import jax
import jax.numpy as jnp
import numpy as np

from brush_tpu.camera import Camera, fov_to_focal
from brush_tpu.data.dataloader import SceneLoader
from brush_tpu.data.formats import Dataset, LoadConfig, load_dataset
from brush_tpu.data.scene import AlphaMode, image_dims
from brush_tpu.io import ply as ply_io
from brush_tpu.models.splats import Splats, grow_capacity
from brush_tpu.render import RenderConfig, camera_inputs
from brush_tpu.train.config import TrainConfig
from brush_tpu.train.eval import EvalStats, eval_views
from brush_tpu.train.refine import refine_step
from brush_tpu.train.splat_init import create_random_splats, to_init_splats
from brush_tpu.train.trainer import (
    SceneBatch, TrainState, init_train_state, train_step)

# Host-byte budget for cached packed eval views (the reference byte-budgets
# its packed-batch cache at 6 GiB, brush-dataset/src/config.rs:8; eval
# splits are smaller, and these live in HOST memory, not HBM).
EVAL_CACHE_BUDGET = 2 << 30


@dataclasses.dataclass
class ProcessConfig:
    """brush-process/src/config.rs ProcessArgs (flattened)."""

    total_iters: int | None = None       # overrides tcfg when set
    eval_every: int = 1000
    export_every: int = 5000
    export_path: str = "./export_{iter}.ply"
    start_iter: int = 0
    seed: int = 42
    init_count: int = 10000              # random-init splat count
    use_pallas: bool = True
    sh_degree: int = 3
    log_every: int = 50
    ckpt_every: int = 0                  # full-state orbax checkpoint cadence
    ckpt_dir: str = "./ckpt"
    resume_from: str | None = None       # checkpoint dir to resume from
    lpips_weights: str | None = None     # VGG-LPIPS weights for the optional
                                         # perceptual loss (lpips_loss_weight)
    eval_save_to_disk: str | None = None  # dir for per-view eval PNGs
    views_per_batch: int = 1             # >1: batched multi-view steps (loss
                                         # = mean over views; with a multi-
                                         # chip mesh this is the dp axis)
    init_isect_cap: int = 1 << 21        # starting capacities; grown on
    init_chunk_cap: int = 1 << 15        # overflow (tests set these tiny)


@dataclasses.dataclass
class TrainMessage:
    kind: str                            # "step" | "refine" | "eval" | "export"
    iter: int
    data: dict


def _next_pow2(n: int) -> int:
    return 1 << max(10, int(math.ceil(math.log2(max(n, 1)))))


def _export_splats(path: str, splats) -> None:
    """Write a ply export; `.compressed.ply` suffix selects SuperSplat
    chunk-quantized output (export.rs picks by the same convention)."""
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    folded = splats.fold_min_scale()
    if path.endswith(".compressed.ply"):
        n = int(folded.n_alive)
        ply_io.save_compressed_ply(
            path,
            means=np.asarray(folded.means[:n]),
            log_scales=np.asarray(folded.log_scales[:n]),
            quats=np.asarray(folded.quats[:n]),
            sh_coeffs=np.asarray(folded.sh_coeffs[:n]),
            raw_opacities=np.asarray(folded.raw_opacities[:n]))
    else:
        Path(path).write_bytes(ply_io.splats_to_ply_bytes(folded))


def init_splats_for_dataset(ds: Dataset, tcfg: TrainConfig,
                            pcfg: ProcessConfig) -> Splats:
    """ply init > point-cloud init > random init (train_stream.rs:102-143)."""
    rng = np.random.default_rng(pcfg.seed)
    cams = [v.camera for v in ds.train.views]
    if ds.init_ply is not None:
        data = ply_io.load_splat_ply(ds.train.vfs.open(ds.init_ply))
        splats = to_init_splats(
            data.means, data.log_scales, data.rotations, data.sh_coeffs,
            data.raw_opacities,
            capacity=_next_pow2(int(data.num_splats * 2)))
    elif ds.init_points is not None and len(ds.init_points) > 0:
        sh = None
        if ds.init_colors is not None:
            from brush_tpu.ops.sh import rgb_to_sh_dc
            sh = np.asarray(rgb_to_sh_dc(ds.init_colors))[:, None, :]
        splats = to_init_splats(
            ds.init_points, sh_coeffs=sh,
            capacity=_next_pow2(int(len(ds.init_points) * 2)))
    else:
        splats = create_random_splats(
            pcfg.init_count, cams, rng,
            scene_scale_override=tcfg.random_init_scene_scale,
            capacity=_next_pow2(pcfg.init_count * 4))
    return splats.with_sh_degree(pcfg.sh_degree)


def view_camera_arrays(ds: Dataset, max_resolution: int):
    """(centers [V,3], focal_px [V]) for the Mip 3D filter
    (train_stream.rs per-view center/focal)."""
    centers, focals = [], []
    for v in ds.train.views:
        w, h = image_dims(ds.train.vfs, v.image_path, max_resolution)
        f = fov_to_focal(v.camera.fov_x, w, v.camera.model)
        centers.append(v.camera.position)
        focals.append(f)
    return (jnp.asarray(np.stack(centers), jnp.float32),
            jnp.asarray(np.array(focals), jnp.float32))


def _attach_scene_to_slot(slot, ds: Dataset, lcfg) -> None:
    """Expose dataset view poses + lazy GT decode to a live viewer
    (nearest-view snapping / training-view compare, SURVEY Appendix F)."""
    views = []
    all_views = []
    for split, scene in (("train", ds.train), ("eval", ds.eval)):
        if scene is None:
            continue
        for v in scene.views:
            views.append(dict(
                name=v.image_path.rsplit("/", 1)[-1], split=split,
                position=[float(x) for x in v.camera.position],
                rotation=[float(x) for x in v.camera.rotation],
                fov_x=float(v.camera.fov_x), fov_y=float(v.camera.fov_y)))
            all_views.append((scene.vfs, v))

    def gt_fn(i: int, max_dim: int = 640):
        from brush_tpu.data.scene import load_image
        vfs, v = all_views[i]
        arr, _ = load_image(vfs, v.image_path, min(max_dim, 4096),
                            mask_path=v.mask_path)
        import numpy as _np
        return (_np.clip(_np.asarray(arr[..., :3], _np.float32), 0, 1)
                * 255).astype(_np.uint8)

    slot.scene_views = views
    slot.gt_fn = gt_fn


def train_process(
    source: str,
    tcfg: TrainConfig | None = None,
    lcfg: LoadConfig | None = None,
    pcfg: ProcessConfig | None = None,
    on_message: Callable[[TrainMessage], None] | None = None,
    slot=None,                 # viewer.Slot: live splat snapshots
    telemetry_dir: str | None = None,
) -> Iterator[TrainMessage]:
    """Full training run as a message stream (train_stream.rs:34-503)."""
    tcfg = tcfg or TrainConfig()
    lcfg = lcfg or LoadConfig()
    pcfg = pcfg or ProcessConfig()
    telem = None
    if telemetry_dir:
        from brush_tpu.utils.telemetry import TelemetryLogger
        telem = TelemetryLogger(telemetry_dir)
    if pcfg.total_iters:
        tcfg = dataclasses.replace(tcfg, total_train_iters=pcfg.total_iters)

    ds = load_dataset(source, lcfg)
    if telem:
        telem.log_scene(ds)
    if slot is not None:
        _attach_scene_to_slot(slot, ds, lcfg)
    splats = init_splats_for_dataset(ds, tcfg, pcfg)
    state = init_train_state(splats, jax.random.PRNGKey(pcfg.seed))

    if pcfg.resume_from:
        # Full-state resume (params + Adam moments + refine record + RNG) —
        # strictly more than the reference's ply + --start-iter (§5.4).
        from brush_tpu.train.checkpoint import (
            checkpoint_meta, load_checkpoint)
        meta = checkpoint_meta(pcfg.resume_from)
        if meta["sh_degree"] != pcfg.sh_degree:
            raise ValueError(
                f"checkpoint sh_degree {meta['sh_degree']} != "
                f"configured {pcfg.sh_degree}")
        if meta["capacity"] != state.splats.capacity:
            if meta["capacity"] > state.splats.capacity:
                state = _grow_state(state, meta["capacity"])
            else:
                raise ValueError(
                    f"checkpoint capacity {meta['capacity']} smaller than "
                    f"init capacity {state.splats.capacity}; lower "
                    "init_count or re-export")
        state = load_checkpoint(pcfg.resume_from, state)
        pcfg = dataclasses.replace(pcfg, start_iter=meta["iteration"])

    loader = SceneLoader(ds.train, seed=pcfg.seed,
                         alpha_mode=lcfg.alpha_mode)
    centers, focals = view_camera_arrays(ds, lcfg.max_resolution)
    eval_cache: dict = {}  # packed eval views, decoded once per run

    # Image sizes vary per view; jit one step per distinct size (the
    # reference recompiles kernels per resolution too, Appendix B).
    step_cache: dict = {}
    refine_jit = jax.jit(lambda s: refine_step(s, tcfg, centers, focals))

    lpips_model = None
    if tcfg.lpips_loss_weight > 0.0 and pcfg.lpips_weights:
        from brush_tpu.models.lpips import load_lpips
        lpips_model = load_lpips(pcfg.lpips_weights)

    batched = pcfg.views_per_batch > 1

    def get_step(img_size, has_alpha, alpha_is_mask, isect_cap, chunk_cap):
        key = (img_size, has_alpha, alpha_is_mask, isect_cap, chunk_cap,
               state.splats.capacity)
        if key not in step_cache:
            rcfg = RenderConfig(
                img_size=img_size, sh_degree=pcfg.sh_degree,
                isect_cap=isect_cap, chunk_cap=chunk_cap,
                use_pallas=pcfg.use_pallas)
            n_dev = math.gcd(pcfg.views_per_batch, len(jax.devices()))
            if batched and n_dev > 1:
                # Multi-chip: shard the view batch over a mesh of the
                # largest device count dividing B (gradients psum over
                # ICI; parallel/data_parallel.py).
                from brush_tpu.parallel.data_parallel import (
                    make_dp_train_step, view_mesh)
                step_cache[key] = make_dp_train_step(
                    view_mesh(jax.devices()[:n_dev]), tcfg, rcfg,
                    has_alpha=has_alpha, alpha_is_mask=alpha_is_mask,
                    lpips_model=lpips_model)
            else:
                from brush_tpu.train.trainer import train_step_impl
                step_cache[key] = jax.jit(
                    lambda s, b: train_step_impl(
                        s, b, tcfg, rcfg, has_alpha=has_alpha,
                        alpha_is_mask=alpha_is_mask, batched=batched,
                        lpips_model=lpips_model),
                    donate_argnums=0)
        return step_cache[key]

    # Initial intersection / gradient-chunk capacities: grow on overflow
    # (replaces the reference's exact-count readback, SURVEY.md §7). The
    # chunk capacity sizes the backward's per-chunk gradient buffer — kept
    # tight because the reduce sort scales with it.
    isect_cap = pcfg.init_isect_cap
    chunk_cap = pcfg.init_chunk_cap
    t_start = time.perf_counter()

    it = pcfg.start_iter
    alpha_is_mask = lcfg.alpha_mode == AlphaMode.MASKED
    prev_aux = None   # (iter, aux) of the previous step, checked one step
    #   behind so the host-side int() reads never stall the dispatch pipeline
    while it < tcfg.total_train_iters:
        view = next(loader)
        if batched:
            # Collect B same-sized views (datasets are near-uniform; odd
            # sizes fall back to repeating until the batch fills).
            views = [view]
            tries = 0
            while len(views) < pcfg.views_per_batch and tries < 4 * pcfg.views_per_batch:
                v = next(loader)
                tries += 1
                if v.img_size == view.img_size and v.has_alpha == view.has_alpha:
                    views.append(v)
            if len(views) < pcfg.views_per_batch:
                # Padding by repetition biases the mean-loss gradient toward
                # the repeated view — surface it instead of silently padding.
                yield TrainMessage("warning", it, dict(
                    message=f"batch padded by repeating a view "
                            f"({len(views)}/{pcfg.views_per_batch} distinct;"
                            f" mixed image sizes in dataset?) — the mean-"
                            f"loss gradient is biased toward the repeat"))
            while len(views) < pcfg.views_per_batch:
                views.append(views[0])  # pad by repeating (rare)
            from brush_tpu.parallel.data_parallel import stack_batches
            batch = stack_batches([
                SceneBatch(gt_packed=jnp.asarray(v.gt_packed),
                           cam=camera_inputs(v.camera, v.img_size))
                for v in views])
        else:
            batch = SceneBatch(
                gt_packed=jnp.asarray(view.gt_packed),
                cam=camera_inputs(view.camera, view.img_size))
        step = get_step(view.img_size, view.has_alpha, alpha_is_mask,
                        isect_cap, chunk_cap)
        state, stats, aux = step(state, batch)
        it += 1

        # Per-step overflow safety: an overflowing step is a device-side
        # NO-OP (trainer gate — no truncated gradient is ever applied);
        # checked here EVERY step, one step delayed, so detection costs no
        # pipeline stall. On overflow grow capacities and recompile; the
        # one or two no-op steps in the detection window are lost views,
        # not corrupt updates.
        if prev_aux is not None:
            p_it, p_aux = prev_aux
            p_isects = int(p_aux.num_isects)
            p_chunks = (int(p_aux.num_chunks)
                        if p_aux.num_chunks is not None else 0)
            grew = False
            if p_isects > isect_cap:
                isect_cap = _next_pow2(int(p_isects * 1.3))
                grew = True
            if p_chunks > chunk_cap:
                chunk_cap = _next_pow2(int(p_chunks * 1.3))
                grew = True
            if grew:
                step_cache.clear()
                msg = TrainMessage("overflow", p_it, dict(
                    isects=p_isects, chunks=p_chunks,
                    isect_cap=isect_cap, chunk_cap=chunk_cap))
                if on_message:
                    on_message(msg)
                yield msg
        prev_aux = (it, aux)

        if it % pcfg.log_every == 0 or it == tcfg.total_train_iters:
            n_isects = int(aux.num_isects)
            msg = TrainMessage("step", it, dict(
                loss=float(stats.loss),
                num_visible=int(stats.num_visible),
                splats=int(state.splats.n_alive),
                isects=n_isects,
                # Slots emitted under bbox-tail semantics (exact tile test
                # bypassed past B_SCAN): monitors the exact-emission saving
                # on real scenes (no-silent-caps).
                bbox_tail_isects=int(aux.num_bbox_tail),
                sps=pcfg.log_every / max(
                    time.perf_counter() - t_start, 1e-9),
            ))
            t_start = time.perf_counter()
            if on_message:
                on_message(msg)
            if telem:
                telem.log_scalars(it, **{k: v for k, v in msg.data.items()
                                         if isinstance(v, (int, float))})
            if slot is not None:
                slot.set(0, state.splats)
            yield msg

        # Refine cadence: every refine_every until 95% progress
        # (train_stream.rs:321-327).
        if (it % tcfg.refine_every == 0
                and it < tcfg.total_train_iters * 0.95):
            # Grow capacity ahead of demand (the only recompile).
            cap = state.splats.capacity
            if int(state.splats.n_alive) > 0.8 * cap and cap < tcfg.max_splats:
                new_cap = min(_next_pow2(cap * 2), _next_pow2(tcfg.max_splats))
                state = _grow_state(state, new_cap)
                refine_jit = jax.jit(
                    lambda s: refine_step(s, tcfg, centers, focals))
                step_cache.clear()
            state, rstats = refine_jit(state)
            # Coarse memory cadence (train_stream.rs:434-441 logs GPU memory
            # on refine cadence because the query stalls behind queued work).
            mem = {}
            dev_stats = jax.local_devices()[0].memory_stats() or {}
            if dev_stats.get("bytes_in_use") is not None:
                mem["mem_used_mb"] = round(
                    dev_stats["bytes_in_use"] / 2**20, 1)
            if dev_stats.get("bytes_limit"):
                mem["mem_limit_mb"] = round(
                    dev_stats["bytes_limit"] / 2**20, 1)
            msg = TrainMessage("refine", it, dict(
                added=int(rstats.num_added), pruned=int(rstats.num_pruned),
                oversized=int(rstats.num_oversized),
                resampled=int(rstats.num_resampled),
                grad_grown=int(rstats.num_grad_grown),
                total=int(rstats.total_splats), **mem))
            if on_message:
                on_message(msg)
            if telem:
                telem.log_scalars(
                    it, refine_added=msg.data["added"],
                    refine_pruned=msg.data["pruned"],
                    refine_oversized=msg.data["oversized"],
                    refine_resampled=msg.data["resampled"],
                    refine_grad_grown=msg.data["grad_grown"],
                    splats_total=msg.data["total"], **mem)
                telem.log_splat_distribution(it, state.splats)
                telem.log_memory(it)
            yield msg

        if pcfg.eval_every and it % pcfg.eval_every == 0 and ds.eval:
            emsg = _run_eval(state, ds, lcfg, pcfg, it, isect_cap, loader,
                             cache=eval_cache)
            if on_message:
                on_message(emsg)
            if telem:
                telem.log_scalars(it, **emsg.data)
            yield emsg

        if pcfg.export_every and it % pcfg.export_every == 0:
            path = pcfg.export_path.format(iter=it)
            _export_splats(path, state.splats)
            yield TrainMessage("export", it, dict(path=path))

        if pcfg.ckpt_every and it % pcfg.ckpt_every == 0:
            from brush_tpu.train.checkpoint import save_checkpoint
            save_checkpoint(pcfg.ckpt_dir, state, iteration=it)
            yield TrainMessage("checkpoint", it, dict(path=pcfg.ckpt_dir))

    # Final export.
    path = pcfg.export_path.format(iter=it)
    _export_splats(path, state.splats)
    yield TrainMessage("export", it, dict(path=path, final=True))

    if telem:
        from brush_tpu.utils.report import write_report
        rpath = write_report(telem.dir)
        yield TrainMessage("report", it, dict(path=str(rpath)))

    # --- LOD baking phases (train_stream.rs:220-291, lod.rs) ---
    if tcfg.lod_levels > 0:
        from brush_tpu.train.lod import decimate_to_count, pup_scores

        lod_loader = None
        for level in range(1, tcfg.lod_levels + 1):
            # PUP scores over a handful of training views at reduced res.
            score_views = ds.train.views[::max(1, len(ds.train.views) // 8)]
            w, h = image_dims(ds.train.vfs, score_views[0].image_path,
                              lcfg.max_resolution, subscale=2)
            score_rcfg = RenderConfig(
                img_size=(w, h), sh_degree=pcfg.sh_degree,
                isect_cap=isect_cap, chunk_cap=chunk_cap,
                use_pallas=pcfg.use_pallas)
            cams = [camera_inputs(v.camera, (w, h)) for v in score_views]
            scores = pup_scores(state.splats, cams, score_rcfg,
                                jax.random.PRNGKey(level), n_probes=4)
            keep = int(int(state.splats.n_alive)
                       * (tcfg.lod_decimation_keep / 100.0))
            new_splats = decimate_to_count(state.splats, scores, keep)
            state = init_train_state(new_splats, state.rng)

            # Fine-tune on downscaled images, growth disabled.
            sub = max(1, round(100 / max(tcfg.lod_image_scale, 1)))
            lod_scene = dataclasses.replace(ds.train, subscale=sub)
            if lod_loader:
                lod_loader.stop()
            lod_loader = SceneLoader(lod_scene, seed=pcfg.seed + level,
                                     alpha_mode=lcfg.alpha_mode)
            lod_tcfg = dataclasses.replace(
                tcfg, growth_stop_iter=0,
                total_train_iters=tcfg.lod_refine_steps)
            lod_cache = {}
            for i in range(tcfg.lod_refine_steps):
                view = next(lod_loader)
                key = view.img_size
                if key not in lod_cache:
                    rc = RenderConfig(img_size=view.img_size,
                                      sh_degree=pcfg.sh_degree,
                                      isect_cap=isect_cap,
                                      use_pallas=pcfg.use_pallas)
                    lod_cache[key] = jax.jit(
                        lambda s, b, rc=rc: train_step(s, b, lod_tcfg, rc),
                        donate_argnums=0)
                b = SceneBatch(gt_packed=jnp.asarray(view.gt_packed),
                               cam=camera_inputs(view.camera, view.img_size))
                state, stats, _ = lod_cache[key](state, b)
            if lod_loader:
                lod_loader.stop()

            lod_path = path.replace(".ply", f"_lod{level}.ply")
            _export_splats(lod_path, state.splats)
            yield TrainMessage("export", it, dict(
                path=lod_path, lod_level=level,
                splats=int(state.splats.n_alive)))
    loader.stop()


def _run_eval(state, ds, lcfg, pcfg, it, isect_cap, loader,
              cache=None):
    """Evaluate on the eval split. `cache` (a dict owned by the caller's
    run) keeps the decoded+packed eval views across evals — the reference
    byte-budget-caches packed batches the same way (scene_loader.rs:57-163);
    without it every eval re-decodes O(views) PNGs on a 1-CPU host.

    The cache is byte-budgeted like the reference's (config.rs:8): packed
    views are kept as HOST numpy up to EVAL_CACHE_BUDGET bytes — never
    pinned in HBM, where a large eval split at high resolution could crowd
    out training state — and transferred per eval; views past the budget
    are re-decoded each eval."""
    from brush_tpu.data.scene import load_image, pack_rgba

    key = ("eval_pairs", lcfg.max_resolution, lcfg.alpha_mode)
    if cache is None or key not in cache:
        cached_pairs = []   # (camera, packed ndarray) within budget
        tail_views = []     # views past the budget: re-decode per eval
        img_size = None
        budget = EVAL_CACHE_BUDGET
        for v in ds.eval.views:
            if budget <= 0:
                tail_views.append(v)
                continue
            arr, _ = load_image(ds.eval.vfs, v.image_path,
                                lcfg.max_resolution, mask_path=v.mask_path)
            packed = pack_rgba(arr, lcfg.alpha_mode)
            budget -= packed.nbytes
            cached_pairs.append((v.camera, packed))
            img_size = (packed.shape[1], packed.shape[0])
        if cache is not None:
            cache[key] = (cached_pairs, tail_views, img_size)
    else:
        cached_pairs, tail_views, img_size = cache[key]
    pairs = [(cam, jnp.asarray(packed)) for cam, packed in cached_pairs]
    for v in tail_views:
        arr, _ = load_image(ds.eval.vfs, v.image_path,
                            lcfg.max_resolution, mask_path=v.mask_path)
        packed = pack_rgba(arr, lcfg.alpha_mode)
        pairs.append((v.camera, jnp.asarray(packed)))
        img_size = img_size or (packed.shape[1], packed.shape[0])
    rcfg = RenderConfig(img_size=img_size, sh_degree=pcfg.sh_degree,
                        isect_cap=isect_cap, use_pallas=pcfg.use_pallas,
                        forward_only=pcfg.use_pallas)
    stats = eval_views(state.splats, pairs, rcfg,
                       save_dir=pcfg.eval_save_to_disk, step=it)
    return TrainMessage("eval", it, dict(psnr=stats.psnr, ssim=stats.ssim))


def _grow_state(state: TrainState, new_cap: int) -> TrainState:
    """Geometric capacity growth: pad splats, moments, refine record."""
    old_cap = state.splats.capacity
    pad = new_cap - old_cap
    splats = grow_capacity(state.splats, new_cap)

    def pad0(x):
        return jnp.concatenate(
            [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)

    opt = {name: st.replace(moment1=pad0(st.moment1),
                            moment2=pad0(st.moment2))
           for name, st in state.opt.items()}
    refine = jax.tree_util.tree_map(pad0, state.refine)
    return state.replace(splats=splats, opt=opt, refine=refine)
