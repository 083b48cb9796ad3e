"""Reference-equivalent PyTorch CPU baseline for throughput comparison.

The actual reference (gcorso/disco-diffdock) cannot run in this image (no
torch_geometric / e3nn / torch_cluster), so this module reimplements its
inference compute pattern faithfully in plain torch, matching
BASELINE.json config #1 style (CPU, eager, host sampling loop):

  * same model shape: ns=24, nv=6, 5 conv layers, sh_lmax=1 fast tensor
    product, 4 edge-group weight MLPs, center conv + torsion bond conv heads
  * dynamic edge counts per step (real radius graphs via cdist, like
    torch_cluster.radius_graph), per-edge scatter-mean (like torch_scatter)
  * a host Python loop over the 20 reverse steps with per-step numpy scalars
    and score-table lookups (mirroring utils/sampling.py:105-198)

Weights are random -- throughput does not depend on weight values.  This is a
measurement harness, not a trained model.
"""
from __future__ import annotations

import math
import time

import numpy as np
import torch
import torch.nn as nn

NS, NV, LAYERS = 24, 6, 5
SIGMA_EMB = 32
DIST_EMB = 32
ESM = 1280


def radius_graph(pos, cutoff, batch=None):
    d = torch.cdist(pos, pos)
    mask = (d < cutoff) & ~torch.eye(len(pos), dtype=torch.bool)
    if batch is not None:  # no cross-pose edges (torch_cluster batch semantics)
        mask &= batch[:, None] == batch[None, :]
    return mask.nonzero().T  # (2, E)


def radius_cross(pos_a, pos_b, cutoff, batch_a=None, batch_b=None):
    d = torch.cdist(pos_a, pos_b)
    mask = d < cutoff
    if batch_a is not None:
        mask &= batch_a[:, None] == batch_b[None, :]
    return mask.nonzero().T


def scatter_mean(src, index, n):
    out = torch.zeros(n, src.shape[-1])
    cnt = torch.zeros(n, 1)
    out.index_add_(0, index, src)
    cnt.index_add_(0, index, torch.ones(len(src), 1))
    return out / cnt.clamp(min=1e-12)


def gaussian_smearing(d, stop, num):
    offset = torch.linspace(0, stop, num)
    coeff = -0.5 / (offset[1] - offset[0]) ** 2
    return torch.exp(coeff * (d[:, None] - offset) ** 2)


def sh_l1(vec):
    v = vec / (vec.norm(dim=-1, keepdim=True) + 1e-12)
    return torch.cat([torch.ones_like(v[:, :1]), math.sqrt(3.0) * v], -1)


class FastTP(nn.Module):
    """lmax=1 fast tensor product (dot/cross/scale), 42->60->84-dim irreps."""

    def __init__(self, in_muls, out_muls):
        super().__init__()
        self.in_muls, self.out_muls = in_muls, out_muls  # dicts 0e/1o/1e/0o
        self.shapes = {
            "0e": (in_muls["0e"] + in_muls["1o"], out_muls["0e"]),
            "1o": (in_muls["0e"] + in_muls["1o"] + in_muls["1e"], out_muls["1o"]),
            "1e": (in_muls["1o"] + in_muls["1e"] + in_muls["0o"], out_muls["1e"]),
            "0o": (in_muls["1e"] + in_muls["0o"], out_muls["0o"]),
        }
        self.numel = sum(a * b for a, b in self.shapes.values())

    def forward(self, x, sh, w):
        im = self.in_muls
        ofs = 0
        blocks = {}
        for key, mul, d in (("0e", im["0e"], 1), ("1o", im["1o"], 3), ("1e", im["1e"], 3), ("0o", im["0o"], 1)):
            if mul:
                blocks[key] = x[:, ofs : ofs + mul * d].reshape(len(x), mul, d)
            ofs += mul * d
        sh0, sh1 = sh[:, 0], sh[:, 1:]
        basis = {"0e": [], "1o": [], "1e": [], "0o": []}
        if im["0e"]:
            basis["0e"].append(blocks["0e"][..., 0] * sh0[:, None])
            basis["1o"].append(blocks["0e"] * sh1[:, None, :])
        if im["1o"]:
            basis["0e"].append((blocks["1o"] * sh1[:, None, :]).sum(-1) / math.sqrt(3))
            basis["1o"].append(blocks["1o"] * sh0[:, None, None])
            basis["1e"].append(torch.linalg.cross(blocks["1o"], sh1[:, None, :].expand_as(blocks["1o"]), dim=-1) / math.sqrt(2))
        if im["1e"]:
            basis["1o"].append(torch.linalg.cross(blocks["1e"], sh1[:, None, :].expand_as(blocks["1e"]), dim=-1) / math.sqrt(2))
            basis["1e"].append(blocks["1e"] * sh0[:, None, None])
            basis["0o"].append((blocks["1e"] * sh1[:, None, :]).sum(-1) / math.sqrt(3))
        if im["0o"]:
            basis["1e"].append(blocks["0o"] * sh1[:, None, :])
            basis["0o"].append(blocks["0o"][..., 0] * sh0[:, None])
        out = []
        wofs = 0
        for key, d in (("0e", 1), ("1o", 3), ("1e", 3), ("0o", 1)):
            fan, om = self.shapes[key]
            if om == 0 or fan == 0:
                wofs += fan * om
                continue
            W = w[:, wofs : wofs + fan * om].reshape(-1, fan, om) / math.sqrt(fan)
            wofs += fan * om
            if d == 1:
                b = torch.cat([t.reshape(len(x), -1) for t in basis[key]], -1)
                out.append(torch.einsum("ef,efo->eo", b, W))
            else:
                b = torch.cat(basis[key], dim=-2)
                out.append(torch.einsum("efk,efo->eok", b, W).reshape(len(x), -1))
        return torch.cat(out, -1)


def mlp(i, h, o):
    return nn.Sequential(nn.Linear(i, h), nn.ReLU(), nn.Linear(h, o))


class RefEquivalentScoreModel(nn.Module):
    def __init__(self):
        super().__init__()
        muls = [
            {"0e": NS, "1o": 0, "1e": 0, "0o": 0},
            {"0e": NS, "1o": NV, "1e": 0, "0o": 0},
            {"0e": NS, "1o": NV, "1e": NV, "0o": 0},
            {"0e": NS, "1o": NV, "1e": NV, "0o": NS},
        ]
        self.tps = nn.ModuleList()
        self.fcs = nn.ModuleList()
        for i in range(LAYERS):
            tp = FastTP(muls[min(i, 3)], muls[min(i + 1, 3)])
            self.tps.append(nn.Module())
            self.tps[-1].tp = tp
            self.fcs.append(nn.ModuleList([mlp(3 * NS, 3 * NS, tp.numel) for _ in range(4)]))
        self.lig_node_emb = nn.Linear(16 + SIGMA_EMB, NS)
        self.rec_node_emb = nn.Linear(1 + ESM + SIGMA_EMB, NS)
        self.lig_edge_emb = mlp(4 + SIGMA_EMB + DIST_EMB, NS, NS)
        self.rec_edge_emb = mlp(SIGMA_EMB + DIST_EMB, NS, NS)
        self.cross_edge_emb = mlp(SIGMA_EMB + DIST_EMB, NS, NS)
        self.center_edge_emb = mlp(DIST_EMB + SIGMA_EMB, NS, NS)
        self.final_tp = FastTP(muls[3], {"0e": 0, "1o": 2, "1e": 2, "0o": 0})
        self.final_fc = mlp(2 * NS, 2 * NS, self.final_tp.numel)
        self.tr_final = mlp(1 + SIGMA_EMB, NS, 1)
        self.rot_final = mlp(1 + SIGMA_EMB, NS, 1)
        self.tor_edge_emb = mlp(DIST_EMB, NS, NS)
        # torsion head approximated with the same fast TP (throughput-neutral)
        self.tor_tp = FastTP(muls[3], {"0e": NS, "1o": 0, "1e": 0, "0o": NS})
        self.tor_fc = mlp(3 * NS, 3 * NS, self.tor_tp.numel)
        self.tor_final = nn.Sequential(nn.Linear(2 * NS, NS, bias=False), nn.Tanh(), nn.Linear(NS, 1, bias=False))

    def forward(self, lig_pos, lig_x, rec_pos, rec_x, rec_edges, bonds, bond_attr, tor_bonds, sig_emb, tr_sigma, lig_batch=None, rec_batch=None):
        nl, nr = len(lig_pos), len(rec_pos)
        if lig_batch is None:
            lig_batch = torch.zeros(nl, dtype=torch.long)
            rec_batch = torch.zeros(nr, dtype=torch.long)
        n_graphs = int(lig_batch.max()) + 1
        lig_attr = self.lig_node_emb(torch.cat([lig_x, sig_emb.expand(nl, -1)], -1))
        rec_attr = self.rec_node_emb(torch.cat([rec_x, sig_emb.expand(nr, -1)], -1))

        redge = radius_graph(lig_pos, 5.0, lig_batch)
        lig_ei = torch.cat([bonds, redge], 1)
        lig_ea = torch.cat([
            torch.cat([bond_attr, torch.zeros(redge.shape[1], 4)], 0),
            sig_emb.expand(lig_ei.shape[1], -1),
            gaussian_smearing((lig_pos[lig_ei[1]] - lig_pos[lig_ei[0]]).norm(dim=-1), 5.0, DIST_EMB),
        ], -1)
        lig_ea = self.lig_edge_emb(lig_ea)
        lig_sh = sh_l1(lig_pos[lig_ei[1]] - lig_pos[lig_ei[0]])

        rec_ea = torch.cat([
            sig_emb.expand(rec_edges.shape[1], -1),
            gaussian_smearing((rec_pos[rec_edges[1]] - rec_pos[rec_edges[0]]).norm(dim=-1), 30.0, DIST_EMB),
        ], -1)
        rec_ea = self.rec_edge_emb(rec_ea)
        rec_sh = sh_l1(rec_pos[rec_edges[1]] - rec_pos[rec_edges[0]])

        cross_ei = radius_cross(lig_pos, rec_pos, float(tr_sigma * 3 + 20), lig_batch, rec_batch)
        cvec = rec_pos[cross_ei[1]] - lig_pos[cross_ei[0]]
        cross_ea = self.cross_edge_emb(torch.cat([
            sig_emb.expand(cross_ei.shape[1], -1),
            gaussian_smearing(cvec.norm(dim=-1), 80.0, DIST_EMB),
        ], -1))
        cross_sh = sh_l1(cvec)

        node = torch.cat([lig_attr, rec_attr], 0)
        ei = torch.cat([
            lig_ei,
            torch.stack([cross_ei[0], cross_ei[1] + nl]),
            rec_edges + nl,
            torch.stack([cross_ei[1] + nl, cross_ei[0]]),
        ], 1)
        ea = [lig_ea, cross_ea, rec_ea, cross_ea]
        shs = torch.cat([lig_sh, cross_sh, rec_sh, cross_sh], 0)
        sizes = [e.shape[0] for e in ea]

        for l in range(LAYERS):
            full_ea = torch.cat(ea, 0)
            feat = torch.cat([full_ea, node[ei[0], :NS], node[ei[1], :NS]], -1)
            ws = []
            o = 0
            for g in range(4):
                ws.append(self.fcs[l][g](feat[o : o + sizes[g]]))
                o += sizes[g]
            w = torch.cat(ws, 0)
            msg = self.tps[l].tp(node[ei[1]], shs, w)
            out = scatter_mean(msg, ei[0], nl + nr)
            pad = out.shape[1] - node.shape[1]
            node = out + torch.nn.functional.pad(node, (0, pad))

        lig_attr = node[:nl]
        # center conv (per-pose centroid virtual node)
        center = scatter_mean(lig_pos, lig_batch, n_graphs)
        cvec = lig_pos - center[lig_batch]
        cea = self.center_edge_emb(torch.cat([
            gaussian_smearing(cvec.norm(dim=-1), 30.0, DIST_EMB), sig_emb.expand(nl, -1)], -1))
        cea = torch.cat([cea, lig_attr[:, :NS]], -1)
        w = self.final_fc(cea)
        gp = scatter_mean(self.final_tp(lig_attr, sh_l1(cvec), w), lig_batch, n_graphs)
        tr_pred, rot_pred = gp[:, :3] + gp[:, 6:9], gp[:, 3:6] + gp[:, 9:]
        trn = tr_pred.norm(dim=-1, keepdim=True)
        tr_pred = tr_pred / trn * self.tr_final(torch.cat([trn, sig_emb.expand(n_graphs, -1)], -1))
        rtn = rot_pred.norm(dim=-1, keepdim=True)
        rot_pred = rot_pred / rtn * self.rot_final(torch.cat([rtn, sig_emb.expand(n_graphs, -1)], -1))

        # torsion head
        if len(tor_bonds):
            bpos = (lig_pos[tor_bonds[:, 0]] + lig_pos[tor_bonds[:, 1]]) / 2
            tei = radius_cross(bpos, lig_pos, 5.0)
            tvec = lig_pos[tei[1]] - bpos[tei[0]]
            tea = self.tor_edge_emb(gaussian_smearing(tvec.norm(dim=-1), 5.0, DIST_EMB))
            bond_feat = lig_attr[tor_bonds[:, 0]] + lig_attr[tor_bonds[:, 1]]
            tea = torch.cat([tea, lig_attr[tei[1], :NS], bond_feat[tei[0], :NS]], -1)
            w = self.tor_fc(tea)
            msg = self.tor_tp(lig_attr[tei[1]], sh_l1(tvec), w)
            tor_feat = scatter_mean(msg, tei[0], len(tor_bonds))
            tor_pred = self.tor_final(tor_feat)[:, 0]
        else:
            tor_pred = torch.zeros(0)
        return tr_pred, rot_pred, tor_pred


@torch.no_grad()
def run_baseline(n_poses=40, steps=20, n_lig=32, n_res=320, seed=0):
    """Pose generation for one complex: returns seconds of wall clock."""
    torch.manual_seed(seed)
    rng = np.random.RandomState(seed)
    model = RefEquivalentScoreModel().eval()

    lig_pos0 = torch.tensor(rng.randn(n_lig, 3) * 4, dtype=torch.float32)
    lig_x = torch.tensor(rng.randn(n_lig, 16), dtype=torch.float32)
    rec_pos = torch.tensor(np.cumsum(rng.randn(n_res, 3), 0) * 1.8, dtype=torch.float32)
    rec_pos -= rec_pos.mean(0)
    rec_x = torch.tensor(rng.randn(n_res, 1 + ESM), dtype=torch.float32)
    d = torch.cdist(rec_pos, rec_pos) + 1e9 * torch.eye(n_res)
    knn = d.topk(24, largest=False).indices
    rec_edges = torch.stack([torch.arange(n_res).repeat_interleave(24), knn.reshape(-1)])
    parent = np.maximum(0, np.arange(n_lig) - 1 - rng.randint(0, 3, n_lig))[1:]
    bonds_np = np.stack([parent, np.arange(1, n_lig)])
    bonds = torch.tensor(np.concatenate([bonds_np, bonds_np[::-1]], 1))
    bond_attr = torch.zeros(bonds.shape[1], 4)
    bond_attr[torch.arange(bonds.shape[1]), torch.randint(0, 4, (bonds.shape[1],))] = 1
    tor_bonds = torch.tensor(bonds_np.T[2 : 2 + 8].copy())

    t_sched = np.linspace(1, 0, steps + 1)[:-1]
    sig_min, sig_max = 0.1, 19.0

    # Batch all poses into one big block-diagonal graph per forward, exactly
    # as the reference's DataLoader over pose copies does (sampling.py:56,65).
    P = n_poses
    big_lig_x = lig_x.repeat(P, 1)
    big_rec_pos = rec_pos.repeat(P, 1)
    big_rec_x = rec_x.repeat(P, 1)
    rec_off = torch.arange(P).repeat_interleave(rec_edges.shape[1]) * n_res
    big_rec_edges = rec_edges.repeat(1, P) + rec_off
    bond_off = torch.arange(P).repeat_interleave(bonds.shape[1]) * n_lig
    big_bonds = bonds.repeat(1, P) + bond_off
    big_bond_attr = bond_attr.repeat(P, 1)
    tor_off = (torch.arange(P) * n_lig)[:, None, None]
    big_tor = (tor_bonds[None] + tor_off).reshape(-1, 2)

    lig_batch = torch.arange(P).repeat_interleave(n_lig)
    rec_batch = torch.arange(P).repeat_interleave(n_res)

    t0 = time.perf_counter()
    pos = (lig_pos0[None] + torch.randn(P, 1, 3) * 5).reshape(P * n_lig, 3)
    for t in t_sched:
        tr_sigma = sig_min ** (1 - t) * sig_max**t
        emb = np.log(10000.0) / (SIGMA_EMB // 2 - 1)
        freq = np.exp(np.arange(SIGMA_EMB // 2) * -emb)
        se = np.concatenate([np.sin(1000 * t * freq), np.cos(1000 * t * freq)])
        sig_emb = torch.tensor(se, dtype=torch.float32)[None]
        tr, rot, tor = model(
            pos, big_lig_x, big_rec_pos, big_rec_x, big_rec_edges, big_bonds,
            big_bond_attr, big_tor, sig_emb, tr_sigma, lig_batch, rec_batch,
        )
        pos = pos + 0.01 * tr[lig_batch]
    elapsed = time.perf_counter() - t0
    return elapsed


if __name__ == "__main__":
    import json
    import sys

    n_poses = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    sec = run_baseline(n_poses=n_poses, steps=steps)
    per_complex = sec * (40 / n_poses)  # extrapolate to the 40-pose workload
    print(json.dumps({"measured_poses": n_poses, "steps": steps,
                      "seconds": sec, "seconds_per_complex_40x20": per_complex}))
