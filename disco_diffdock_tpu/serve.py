"""Thin production serving surface: HTTP docking service over the jitted
sampler.

No reference counterpart (the reference is research CLIs only); this
completes the production story the TPU way: one process owns the chip,
programs compile once per (bucket, samples) and are reused across requests,
and requests are plain JSON over stdlib HTTP (no server dependencies).

    python -m disco_diffdock_tpu.serve --model_dir workdir/score_run \
        [--confidence_model_dir ...] [--port 8000]

    POST /dock
      {"protein_pdb": "<PDB text>",            # or "protein_path": "..."
       "ligand_sdf": "<SDF text>",             # or "ligand": "path-or-SMILES"
       "samples": 10, "steps": 20}
    -> {"poses": [{"rank": 1, "confidence": ..., "sdf": "<SDF text>"}, ...]}

    GET /healthz -> {"ok": true, "programs": <compiled program count>}

Concurrency: requests are handled on one thread (the chip is a serial
resource); the HTTP layer queues.  Shape bucketing bounds compile count.
"""
from __future__ import annotations

import argparse
from functools import partial
import json
import os
import tempfile
import threading
import time
from http.server import BaseHTTPRequestHandler, HTTPServer

import jax
import numpy as np


class DockingService:
    """Owns the models and the per-bucket compiled programs."""

    def __init__(self, model_dir: str, confidence_model_dir: str | None = None,
                 ckpt: str = "best_ema_inference", allow_paths: bool = False,
                 ar_model_dir: str | None = None, ar_ckpt: str = "best",
                 confidence_ckpt: str = "best",
                 softmax_latent_temperature: float = 1.0,
                 allow_seed_latents: bool = False):
        from .config import ScoreModelConfig
        from .data.collate import DEFAULT_BUCKETS
        from .geom.diffusion import SigmaSchedule
        from .models.all_atom_score_model import AllAtomScoreModel
        from .models.score_model import TensorProductScoreModel
        from .train.checkpoints import load_config
        from .train.loading import (
            build_score_runtime, cfg_from_dict, load_run_configs, restore_variables,
        )

        self.model_dir = model_dir
        self.allow_paths = allow_paths
        self.score_cfg, self.enc_cfg, run_caps = load_run_configs(model_dir)
        self.buckets = ((run_caps,) if run_caps is not None else ()) + tuple(DEFAULT_BUCKETS)
        self.sigma = SigmaSchedule()
        self.ckpt = ckpt
        self.confidence_model_dir = confidence_model_dir
        self.confidence_ckpt = confidence_ckpt
        self.ar_model_dir = ar_model_dir
        self.ar_ckpt = ar_ckpt
        self.softmax_latent_temperature = softmax_latent_temperature
        if self.enc_cfg is not None and not ar_model_dir \
                and not allow_seed_latents:
            # oracle-encoder latents need the ground-truth pose, which a
            # docking request never has; serving a DisCo run without the AR
            # prior would silently condition on latents of the seed conformer
            raise SystemExit(
                f"{model_dir} is a DisCo run (latent encoder in its yml); "
                f"serving needs --ar_model_dir so latents come from the AR "
                f"prior.  allow_seed_latents overrides (smoke tests only)"
            )
        if ar_model_dir and self.enc_cfg is None:
            # mirror of eval/evaluate.py's guard: a latent-free score run
            # cannot consume AR latents; proceeding would feed zero-width
            # latents into a model initialized without them
            raise SystemExit(
                "--ar_model_dir requires a score run trained WITH a latent "
                f"encoder, but {model_dir} has no encoder config")
        self._conf_cfg = None
        if confidence_model_dir:
            conf_run = load_config(confidence_model_dir)
            self._conf_cfg = cfg_from_dict(conf_run["confidence_model"], ScoreModelConfig)
        # (caps, samples, steps) -> compiled runner
        self._programs: dict = {}
        self._runtimes: dict = {}  # caps -> (model, variables, latent_fn, conf...)
        self._lock = threading.Lock()
        self._build_score_runtime = build_score_runtime
        self._restore_variables = restore_variables
        self._AllAtom = AllAtomScoreModel
        self._TPScore = TensorProductScoreModel

    def _runtime(self, caps):
        if caps not in self._runtimes:
            model, variables, latent_fn, _, _ = self._build_score_runtime(
                self.model_dir, caps, tag=self.ckpt,
            )
            if self.ar_model_dir:
                # AR-prior latents (one shared construction across
                # evaluate/dock/serve: train/loading.build_ar_latent_fn)
                from .train.loading import build_ar_latent_fn

                latent_fn = build_ar_latent_fn(
                    self.ar_model_dir, self.score_cfg, caps,
                    ar_ckpt=self.ar_ckpt,
                    softmax_latent_temperature=self.softmax_latent_temperature,
                    shared_rec=True,  # one complex, S poses
                )

            conf_model = conf_vars = None
            if self.confidence_model_dir:
                cc = self._conf_cfg
                conf_model = self._AllAtom(cfg=cc, caps=caps) if cc.all_atoms \
                    else self._TPScore(cfg=cc, caps=caps)
                conf_vars = self._restore_variables(
                    self.confidence_model_dir, self.confidence_ckpt,
                    use_ema=False)
            self._runtimes[caps] = (model, variables, latent_fn, conf_model, conf_vars)
        return self._runtimes[caps]

    def _program(self, caps, steps):
        from .sampling import SamplerConfig, randomize_position, sampling

        key = (caps, steps)
        if key not in self._programs:
            model, variables, latent_fn, conf_model, conf_vars = self._runtime(caps)
            scfg = SamplerConfig(inference_steps=steps, no_final_step_noise=True)

            from .utils.xla_opts import tpu_compiler_options

            @partial(jax.jit, compiler_options=tpu_compiler_options())
            def _run(batch, rng):
                k1, k2, k3 = jax.random.split(rng, 3)
                rb = randomize_position(k1, batch, scfg.no_torsion,
                                        scfg.no_random, self.sigma.tr_sigma_max)
                # latents AFTER randomization (ar_pos semantics,
                # utils/sampling.py:36-46,83-88)
                latent = latent_fn(rb, k3) if latent_fn is not None else None
                return sampling(
                    model, variables, rb, k2, scfg, self.sigma, latent=latent,
                    confidence_model=conf_model, confidence_variables=conf_vars,
                    shared_rec=True,  # one complex, S pose copies
                )

            self._programs[key] = _run
        return self._programs[key]

    def dock(self, protein_path: str | None, ligand: str, samples: int = 10,
             steps: int = 20, seed: int = 0, name: str = "complex",
             protein_sequence: str | None = None, out_dir: str | None = None,
             esm: "np.ndarray | None" = None, esmfold_model=None) -> dict:
        from .data import minichem
        from .data.collate import collate, fits, replicate_record
        from .data.inference import record_from_paths
        from .eval.dock import _ligand_write_meta

        with self._lock:  # the chip is a serial resource
            t0 = time.time()
            rec = record_from_paths(
                protein_path, ligand, name=name, esm=esm,
                # all-atom arrays whenever ANY loaded model needs them — the
                # score model itself may be all-atom (eval/dock.py:144)
                all_atoms=(self.score_cfg.all_atoms
                           or (self._conf_cfg is not None
                               and self._conf_cfg.all_atoms)),
                protein_sequence=protein_sequence, out_dir=out_dir,
                esmfold_model=esmfold_model,
            )
            if rec is None:
                raise ValueError("featurization failed")
            caps = next((c for c in self.buckets if fits(rec, c)), None)
            if caps is None:
                raise ValueError(
                    "input exceeds every size bucket (ligand atoms / "
                    "residues / rotatable bonds larger than the largest "
                    "configured capacity)")
            batch = collate(replicate_record(rec, samples), caps,
                            esm_dim=self.score_cfg.esm_embedding_dim)
            run = self._program(caps, steps)
            final, conf, _ = run(batch, jax.random.PRNGKey(seed))
            pos = np.asarray(final.lig_pos)  # host fetch = device sync
            confs = np.asarray(conf) if conf is not None else np.zeros(samples)
            mask = np.asarray(batch.lig_mask[0])
            center = np.asarray(rec.get("original_center", np.zeros(3)))
            wmol = _ligand_write_meta(ligand)
            order = np.argsort(-confs)
            poses = [
                {
                    "rank": r + 1,
                    "confidence": float(confs[i]),
                    "sdf": minichem.write_sdf(wmol, pos[i][mask] + center,
                                              name=f"{name}_rank{r + 1}"),
                }
                for r, i in enumerate(order)
            ]
            return {"name": name, "poses": poses,
                    "seconds": round(time.time() - t0, 3)}

    def warmup(self, samples: int = 10, steps: int = 20, n_buckets: int = 1,
               executions: int = 12, seed: int = 0) -> list:
        """Pre-compile and warm-execute the first ``n_buckets`` docking
        programs so no user request pays compile + warm-in.

        A freshly compiled (or cache-loaded) executable runs up to ~10x
        below steady state for roughly its first dozen executions on a
        tunneled TPU (benchmarks/profile_notes.md, methodology addendum
        #3); without warmup that cost lands on the first requests per
        bucket.  The program cache is keyed ``(caps, steps)`` but jit
        re-traces per batch shape, so warm with the ``samples``/``steps``
        values production requests will actually send.
        """
        from .data.collate import collate, fits, replicate_record
        from .data.synthetic import make_complex_record

        all_atoms = (self.score_cfg.all_atoms
                     or (self._conf_cfg is not None and self._conf_cfg.all_atoms))
        warmed = []
        with self._lock:
            for caps in self.buckets[:n_buckets]:
                rec = None
                # shrink until the synthetic complex fits (tiny fixture-run
                # caps can have tor_cap < the spanning-tree torsion count)
                for n_lig in (min(8, caps.max_lig), 4, 3):
                    cand = make_complex_record(
                        seed=seed, n_lig=n_lig,
                        n_res=min(16, caps.max_rec),
                        esm_dim=self.score_cfg.esm_embedding_dim,
                        all_atoms=all_atoms,
                    )
                    if fits(cand, caps):
                        rec = cand
                        break
                if rec is None:
                    # warmup is an optimization: an unfittable bucket
                    # (unusual run caps) must never prevent serving -- the
                    # bucket will just compile on its first real request
                    print(f"serve: WARNING skipping warmup for bucket {caps}"
                          " (no synthetic complex fits)", flush=True)
                    continue
                batch = collate(replicate_record(rec, samples), caps,
                                esm_dim=self.score_cfg.esm_embedding_dim)
                t0 = time.time()
                run = self._program(caps, steps)
                key = jax.random.PRNGKey(seed)
                final = None
                for i in range(max(int(executions), 1)):
                    final, _, _ = run(batch, jax.random.fold_in(key, i))
                # host fetch = device sync (block_until_ready is unreliable
                # through the tunnel); TPU executes dispatches in issue
                # order, so fetching the last result drains the whole chain
                np.asarray(final.lig_pos)
                dt = time.time() - t0
                warmed.append({"max_lig": caps.max_lig, "max_rec": caps.max_rec,
                               "seconds": round(dt, 3)})
                print(f"HAPPENING | warmed bucket lig<={caps.max_lig} "
                      f"rec<={caps.max_rec} x{executions} runs "
                      f"({samples} samples, {steps} steps) in {dt:.1f}s")
        return warmed

    @property
    def program_count(self):
        return len(self._programs)


def make_handler(service: DockingService):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet
            pass

        def _json(self, code: int, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._json(200, {"ok": True, "programs": service.program_count})
            else:
                self._json(404, {"error": "not found"})

        def do_POST(self):
            if self.path != "/dock":
                self._json(404, {"error": "not found"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n))
                # TemporaryDirectory so request payloads never accumulate on
                # disk; host filesystem paths (protein_path / non-inline
                # ligand) are an arbitrary-file-read surface and require
                # --allow-paths (safe default for anything beyond localhost).
                with tempfile.TemporaryDirectory(prefix="dock_") as tmpdir:
                    if "protein_pdb" in req:
                        protein_path = os.path.join(tmpdir, "rec.pdb")
                        with open(protein_path, "w") as f:
                            f.write(req["protein_pdb"])
                    else:
                        protein_path = req.get("protein_path")
                        if protein_path is not None and not service.allow_paths:
                            raise PermissionError(
                                "protein_path requires --allow-paths; send "
                                "protein_pdb inline instead")
                    if "ligand_sdf" in req:
                        ligand = os.path.join(tmpdir, "lig.sdf")
                        with open(ligand, "w") as f:
                            f.write(req["ligand_sdf"])
                    else:
                        ligand = req["ligand"]
                        if os.path.exists(ligand) and not service.allow_paths:
                            raise PermissionError(
                                "ligand file paths require --allow-paths; "
                                "send ligand_sdf inline or a SMILES string")
                    out = service.dock(
                        protein_path, ligand,
                        samples=int(req.get("samples", 10)),
                        steps=int(req.get("steps", 20)),
                        seed=int(req.get("seed", 0)),
                        name=req.get("name", "complex"),
                    )
                self._json(200, out)
            except Exception as e:  # failure -> structured error, keep serving
                self._json(500, {"error": f"{type(e).__name__}: {e}"})

    return Handler


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model_dir", required=True)
    p.add_argument("--confidence_model_dir", default=None)
    p.add_argument("--confidence_ckpt", default="best")
    p.add_argument("--ar_model_dir", default=None,
                   help="AR prior run dir (required for DisCo score runs)")
    p.add_argument("--ar_ckpt", default="best")
    p.add_argument("--softmax_latent_temperature", type=float, default=1.0)
    p.add_argument("--allow_seed_latents", action="store_true",
                   help="serve a DisCo run WITHOUT an AR prior: encoder "
                        "latents from the seed conformer — smoke tests only")
    p.add_argument("--ckpt", default="best_ema_inference")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--allow-paths", action="store_true",
                   help="let requests reference host filesystem paths "
                        "(protein_path / ligand files); off by default since "
                        "it is an arbitrary-file-read surface")
    p.add_argument("--warmup", type=int, default=0, metavar="N",
                   help="pre-compile and warm-execute the first N bucket "
                        "programs in dock()'s first-fit priority order (the "
                        "run's exact training caps, then the default ladder "
                        "smallest-first) so the first requests per bucket "
                        "don't pay compile + executable warm-in")
    p.add_argument("--warmup_samples", type=int, default=10,
                   help="pose count warmup batches use (jit re-traces per "
                        "samples value — match production requests)")
    p.add_argument("--warmup_steps", type=int, default=20)
    p.add_argument("--warmup_executions", type=int, default=12,
                   help="executions per warmed program (steady state takes "
                        "~a dozen on a tunneled TPU)")
    args = p.parse_args(argv)
    service = DockingService(args.model_dir, args.confidence_model_dir, args.ckpt,
                             allow_paths=args.allow_paths,
                             ar_model_dir=args.ar_model_dir,
                             ar_ckpt=args.ar_ckpt,
                             confidence_ckpt=args.confidence_ckpt,
                             softmax_latent_temperature=args.softmax_latent_temperature,
                             allow_seed_latents=args.allow_seed_latents)
    if args.warmup:
        service.warmup(samples=args.warmup_samples, steps=args.warmup_steps,
                       n_buckets=args.warmup, executions=args.warmup_executions)
    server = HTTPServer((args.host, args.port), make_handler(service))
    print(f"HAPPENING | serving on http://{args.host}:{args.port} "
          f"(POST /dock, GET /healthz)")
    server.serve_forever()


if __name__ == "__main__":
    main()
