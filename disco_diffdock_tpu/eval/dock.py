"""User-facing docking CLI: protein + ligand in, ranked SDF poses out.

The reference ships an ``InferenceDataset`` for arbitrary protein/ligand
inputs (utils/inference_utils.py:153-275) but no driver consumes it; this CLI
completes that path the TPU way: featurize -> bucketed padded batch -> the
jitted reverse-diffusion sampler (+ optional AR latents and confidence
reranking) -> poses written back in the input protein frame as SDF files.

    python -m disco_diffdock_tpu.eval.dock \
        --protein receptor.pdb --ligand ligand.sdf \
        --model_dir workdir/score_run \
        [--confidence_model_dir workdir/conf_run] \
        [--samples_per_complex 10] [--inference_steps 20] \
        [--out_dir results/dock]

Sequence-only input: pass ``--protein_sequence`` instead of ``--protein``
and the structure is folded with the ESMFold hook (data/esm.py; needs
fair-esm).  SMILES ligands need RDKit; SDF files work dependency-free via
minichem.
"""
from __future__ import annotations

import argparse
from functools import partial
import json
import os

import jax
import numpy as np

from ..data import featurize, minichem
from ..data.collate import DEFAULT_BUCKETS, collate, fits, replicate_record
from ..data.inference import record_from_paths
from ..geom.diffusion import SigmaSchedule
from ..sampling import SamplerConfig, randomize_position, sampling


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--protein", default=None, help="receptor PDB path")
    p.add_argument("--protein_sequence", default=None,
                   help="fold with ESMFold when no --protein is given")
    p.add_argument("--ligand", default=None, help="SDF/MOL2 path or SMILES")
    p.add_argument("--protein_ligand_csv", default=None,
                   help="batch mode: CSV with header complex_name,"
                        "protein_path,ligand_description[,protein_sequence]; "
                        "programs compile once per shape bucket and are "
                        "reused across rows")
    p.add_argument("--model_dir", required=True, help="trained score run dir")
    p.add_argument("--confidence_model_dir", default=None)
    p.add_argument("--ar_model_dir", default=None)
    p.add_argument("--ckpt", "--ckpt_score", dest="ckpt",
                   default="best_ema_inference")
    p.add_argument("--ar_ckpt", default="best")
    p.add_argument("--confidence_ckpt", default="best")
    p.add_argument("--samples_per_complex", type=int, default=10)
    p.add_argument("--actual_steps", type=int, default=None)
    p.add_argument("--ode", action="store_true")
    p.add_argument("--no_random", action="store_true")
    p.add_argument("--inference_steps", type=int, default=20)
    p.add_argument("--out_dir", default="results/dock")
    p.add_argument("--name", default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--esm_embeddings_path", default=None,
                   help="npz of name -> (n_res, dim) LM embeddings")
    p.add_argument("--keep_local_structures", action="store_true")
    p.add_argument("--save_visualisation", action="store_true",
                   help="write per-pose reverse-diffusion trajectories as "
                        "multi-MODEL PDB files")
    p.add_argument("--temp_sampling", type=float, nargs=3, default=[1.0, 1.0, 1.0])
    p.add_argument("--temp_psi", type=float, nargs=3, default=[0.0, 0.0, 0.0])
    p.add_argument("--temp_sigma_data", type=float, nargs=3, default=[0.5, 0.5, 0.5])
    p.add_argument("--classifier_free_guidance_weight", type=float, default=0.0)
    p.add_argument("--softmax_latent_temperature", type=float, default=1.0)
    p.add_argument("--allow_seed_latents", action="store_true",
                   help="let a DisCo run dock WITHOUT an AR prior: encoder "
                        "latents are computed from the seed conformer "
                        "(meaningless pose) — smoke tests only")
    return p.parse_args(argv)


def _rdkit_to_minimol(mol, pos=None) -> "minichem.MiniMol":
    """RDKit mol -> MiniMol shell for SDF writing: formal charges and the
    Kekule bond orders come along so write_sdf emits valid V2000 (type-4
    aromatic bonds are query-only in SDF) and charged ligands round-trip."""
    from rdkit import Chem

    elements = [a.GetSymbol() for a in mol.GetAtoms()]
    charges = np.asarray([a.GetFormalCharge() for a in mol.GetAtoms()], np.int32)
    tmap = {"SINGLE": 1, "DOUBLE": 2, "TRIPLE": 3, "AROMATIC": 4}
    bonds = [(b.GetBeginAtomIdx(), b.GetEndAtomIdx()) for b in mol.GetBonds()]
    types = [tmap.get(str(b.GetBondType()), 1) for b in mol.GetBonds()]
    kek = Chem.Mol(mol)
    try:
        Chem.Kekulize(kek, clearAromaticFlags=True)
        ktypes = [tmap.get(str(b.GetBondType()), 1) for b in kek.GetBonds()]
    except Exception:  # kekulization can fail on exotic input; keep types
        ktypes = types
    if pos is None:
        pos = (np.asarray(mol.GetConformer().GetPositions(), np.float32)
               if mol.GetNumConformers()
               else np.zeros((len(elements), 3), np.float32))
    return minichem.MiniMol(
        elements=elements,
        pos=np.asarray(pos, np.float32),
        bonds=np.asarray(bonds, np.int32).reshape(-1, 2),
        bond_types=np.asarray(types, np.int32),
        charges=charges,
        kekule_types=np.asarray(ktypes, np.int32),
    )


def _ligand_write_meta(ligand_description: str, remove_hs: bool = True):
    """(elements, bonds, bond_types) of the featurized ligand for SDF output,
    in the same atom order the record uses."""
    if os.path.exists(ligand_description):
        mol = featurize.read_molecule(ligand_description, remove_hs=remove_hs)
        if isinstance(mol, minichem.MiniMol):
            return mol
        return _rdkit_to_minimol(mol)
    # SMILES path: rebuild via RDKit exactly as record_from_paths does
    from rdkit import Chem

    mol = Chem.MolFromSmiles(ligand_description)
    mol = Chem.RemoveHs(Chem.AddHs(mol)) if remove_hs else Chem.AddHs(mol)
    return _rdkit_to_minimol(
        mol, pos=np.zeros((mol.GetNumAtoms(), 3), np.float32))


def dock(args):
    from .evaluate import evaluate_complexes  # noqa: F401 (shared helpers)
    from ..config import ScoreModelConfig
    from ..models.all_atom_score_model import AllAtomScoreModel
    from ..models.score_model import TensorProductScoreModel
    from ..train.checkpoints import load_config
    from ..train.loading import (
        build_score_runtime, cfg_from_dict, load_run_configs, restore_variables,
    )

    name = args.name or (
        os.path.splitext(os.path.basename(args.protein))[0] if args.protein
        else "seq_complex"
    )
    esm = None
    if args.esm_embeddings_path:
        # Key on the resolved name: args.protein is None in
        # --protein_sequence mode, so basename(args.protein) would raise.
        with np.load(args.esm_embeddings_path) as z:
            key = (os.path.splitext(os.path.basename(args.protein))[0]
                   if args.protein else name)
            esm = z[key] if key in z else None

    score_cfg, enc_cfg, run_caps = load_run_configs(args.model_dir)
    rec = record_from_paths(
        args.protein, args.ligand, esm=esm, name=name,
        keep_local_structures=args.keep_local_structures,
        all_atoms=(args.confidence_model_dir is not None
                   or score_cfg.all_atoms),
        protein_sequence=args.protein_sequence, out_dir=args.out_dir,
        seed=args.seed,
    )
    if rec is None:
        raise SystemExit("featurization failed")

    if enc_cfg is not None and not args.ar_model_dir \
            and not args.allow_seed_latents:
        # oracle-encoder latents need the ground-truth pose, which a docking
        # request never has — fail fast instead of silently conditioning on
        # latents of the seed conformer
        raise SystemExit(
            f"{args.model_dir} is a DisCo run (latent encoder in its yml); "
            f"docking needs --ar_model_dir so latents come from the AR "
            f"prior.  --allow_seed_latents overrides (encoder latents of "
            f"the seed conformer — smoke tests only)"
        )
    if args.ar_model_dir and enc_cfg is None:
        # mirror of eval/evaluate.py's guard: silently dropping the requested
        # AR prior would misreport the protocol that ran
        raise SystemExit(
            "--ar_model_dir requires a score run trained WITH a latent "
            f"encoder, but {args.model_dir} has no encoder config — AR "
            "latents would be silently ignored")

    buckets = ((run_caps,) if run_caps is not None else ()) + tuple(DEFAULT_BUCKETS)
    caps = next((c for c in buckets if fits(rec, c)), None)
    if caps is None:
        raise SystemExit(
            "input exceeds every size bucket (ligand atoms / residues / "
            "rotatable bonds larger than the largest configured capacity)")
    S = args.samples_per_complex
    batch = collate(replicate_record(rec, S), caps, esm_dim=score_cfg.esm_embedding_dim)

    model, variables, latent_fn, _, enc_cfg = build_score_runtime(
        args.model_dir, caps, tag=args.ckpt,
    )

    conf_model = conf_vars = None
    if args.confidence_model_dir:
        conf_run = load_config(args.confidence_model_dir)
        conf_cfg = cfg_from_dict(conf_run["confidence_model"], ScoreModelConfig)
        conf_model = AllAtomScoreModel(cfg=conf_cfg, caps=caps) if conf_cfg.all_atoms \
            else TensorProductScoreModel(cfg=conf_cfg, caps=caps)
        conf_vars = restore_variables(args.confidence_model_dir,
                                      args.confidence_ckpt, use_ema=False)

    if enc_cfg is not None and args.ar_model_dir:
        from ..train.loading import build_ar_latent_fn

        latent_fn = build_ar_latent_fn(
            args.ar_model_dir, score_cfg, caps, ar_ckpt=args.ar_ckpt,
            softmax_latent_temperature=args.softmax_latent_temperature,
            shared_rec=True,  # one complex, S poses
        )

    sigma = SigmaSchedule()
    scfg = SamplerConfig(
        inference_steps=args.inference_steps,
        actual_steps=args.actual_steps,
        ode=args.ode,
        no_random=args.no_random,
        no_final_step_noise=True,
        temp_sampling=tuple(args.temp_sampling),
        temp_psi=tuple(args.temp_psi),
        temp_sigma_data=tuple(args.temp_sigma_data),
        cfg_weight=args.classifier_free_guidance_weight,
        return_trajectory=args.save_visualisation,
    )

    from ..utils.xla_opts import tpu_compiler_options

    @partial(jax.jit, compiler_options=tpu_compiler_options())
    def _run(b, key):
        k1, k2, k3 = jax.random.split(key, 3)
        rb = randomize_position(k1, b, scfg.no_torsion, scfg.no_random,
                                sigma.tr_sigma_max)
        # latents AFTER randomization (the reference's ar_pos semantics,
        # utils/sampling.py:36-46,83-88)
        latent = latent_fn(rb, k3) if latent_fn is not None else None
        return sampling(
            model, variables, rb, k2, scfg, sigma, latent=latent,
            confidence_model=conf_model, confidence_variables=conf_vars,
            shared_rec=True,  # one complex, S pose copies
        )

    final, conf, traj = _run(batch, jax.random.PRNGKey(args.seed))
    pos = np.asarray(final.lig_pos)  # host fetch = device sync
    confs = np.asarray(conf) if conf is not None else np.zeros(S)
    mask = np.asarray(batch.lig_mask[0])
    center = np.asarray(rec.get("original_center", np.zeros(3)))

    order = np.argsort(-confs)  # best confidence first
    wmol = _ligand_write_meta(args.ligand)
    os.makedirs(args.out_dir, exist_ok=True)
    results = []
    for rank, i in enumerate(order, 1):
        p = pos[i][mask] + center  # back to the input protein frame
        path = os.path.join(args.out_dir, f"{name}_rank{rank}.sdf")
        with open(path, "w") as f:
            f.write(minichem.write_sdf(wmol, p, name=f"{name}_rank{rank}"))
        results.append({"rank": rank, "file": os.path.basename(path),
                        "confidence": float(confs[i])})
        if args.save_visualisation and traj is not None:
            from .visualise import PDBTrajectory

            viz = PDBTrajectory(wmol.elements)
            for frame in np.asarray(traj)[:, i]:
                viz.add(frame[mask] + center)
            viz.write(os.path.join(args.out_dir, f"{name}_rank{rank}_traj.pdb"))
    with open(os.path.join(args.out_dir, f"{name}_results.json"), "w") as f:
        json.dump({"name": name, "poses": results}, f, indent=2)
    print(json.dumps({"name": name, "n_poses": S,
                      "best_confidence": float(confs[order[0]]),
                      "out_dir": args.out_dir}))
    return results


def dock_csv(args):
    """Batch docking over a protein/ligand CSV (reference InferenceDataset's
    list inputs, utils/inference_utils.py:153-210), through the serving
    layer so same-bucket rows reuse one compiled program."""
    import csv

    from ..serve import DockingService

    service = DockingService(
        args.model_dir, args.confidence_model_dir, args.ckpt,
        ar_model_dir=args.ar_model_dir, ar_ckpt=args.ar_ckpt,
        confidence_ckpt=args.confidence_ckpt,
        softmax_latent_temperature=args.softmax_latent_temperature,
        allow_seed_latents=args.allow_seed_latents,
    )
    os.makedirs(args.out_dir, exist_ok=True)
    results = []
    with open(args.protein_ligand_csv) as f:
        for i, row in enumerate(csv.DictReader(f)):
            name = row.get("complex_name") or f"complex{i}"
            try:
                out = service.dock(
                    row.get("protein_path") or None,
                    row["ligand_description"],
                    samples=args.samples_per_complex,
                    steps=args.inference_steps,
                    seed=args.seed + i, name=name,
                    protein_sequence=row.get("protein_sequence") or None,
                    out_dir=args.out_dir,
                )
            except Exception as e:
                print(f"| WARNING: {name} failed ({type(e).__name__}: {e})")
                results.append({"name": name, "error": str(e)})
                continue
            row_dir = os.path.join(args.out_dir, name)
            os.makedirs(row_dir, exist_ok=True)
            for pose in out["poses"]:
                with open(os.path.join(row_dir, f"rank{pose['rank']}.sdf"), "w") as g:
                    g.write(pose.pop("sdf"))
            results.append(out)
            print(f"{name}: best confidence {out['poses'][0]['confidence']:.3f} "
                  f"({out['seconds']}s)")
    with open(os.path.join(args.out_dir, "results.json"), "w") as f:
        json.dump(results, f, indent=2)
    return results


def main(argv=None):
    args = parse_args(argv)
    if args.protein_ligand_csv:
        return dock_csv(args)
    if not args.ligand:
        raise SystemExit("need --ligand (or --protein_ligand_csv)")
    return dock(args)


if __name__ == "__main__":
    main()
