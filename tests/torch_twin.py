"""PyTorch twin modules for golden-parity tests.

BASELINE.json config 1 requires per-layer activations allclose between the
JAX model and a reference-math PyTorch implementation (SURVEY.md §4). These
twins implement the same math with torch's own independent kernels
(torch.nn.GRU, conv1d, softmax) and load their weights FROM the flax params,
so any disagreement exposes a semantic divergence in our JAX modules.

Test-only helper — torch never enters the gtos_tpu package.
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn.functional as F


def _t(x) -> torch.Tensor:
    return torch.from_numpy(np.asarray(x, dtype=np.float32))


class TorchRelationEncoder(torch.nn.Module):
    """Bidirectional GRU path encoder matching gtos_tpu RelationEncoder."""

    def __init__(self, flax_params: dict, vocab: int, emb_dim: int, hidden: int, out_dim: int):
        super().__init__()
        p = flax_params["params"]
        self.embed = torch.nn.Embedding(vocab, emb_dim)
        self.embed.weight.data = _t(p["rel_embed"]["embedding"])
        self.gru = torch.nn.GRU(emb_dim, hidden, bidirectional=True, batch_first=True)
        for direction, name in ((0, "gru_fwd"), (1, "gru_bwd")):
            cell = p[name]["cell"]
            sfx = "" if direction == 0 else "_reverse"
            # torch gate order is (r, z, n); flax kernels are [in, out] -> transpose
            w_ih = torch.cat([_t(cell["ir"]["kernel"]).T,
                              _t(cell["iz"]["kernel"]).T,
                              _t(cell["in"]["kernel"]).T], dim=0)
            w_hh = torch.cat([_t(cell["hr"]["kernel"]).T,
                              _t(cell["hz"]["kernel"]).T,
                              _t(cell["hn"]["kernel"]).T], dim=0)
            b_ih = torch.cat([_t(cell["ir"]["bias"]),
                              _t(cell["iz"]["bias"]),
                              _t(cell["in"]["bias"])])
            # flax has no bias on hr/hz, bias on hn only
            hidden_t = _t(cell["hn"]["bias"])
            b_hh = torch.cat([torch.zeros_like(hidden_t),
                              torch.zeros_like(hidden_t), hidden_t])
            getattr(self.gru, f"weight_ih_l0{sfx}").data = w_ih
            getattr(self.gru, f"weight_hh_l0{sfx}").data = w_hh
            getattr(self.gru, f"bias_ih_l0{sfx}").data = b_ih
            getattr(self.gru, f"bias_hh_l0{sfx}").data = b_hh
        self.out_proj = torch.nn.Linear(2 * hidden, out_dim)
        self.out_proj.weight.data = _t(p["out_proj"]["kernel"]).T
        self.out_proj.bias.data = _t(p["out_proj"]["bias"])

    @torch.no_grad()
    def forward(self, bank: np.ndarray, lengths: np.ndarray) -> np.ndarray:
        bank_t = torch.from_numpy(np.asarray(bank, dtype=np.int64))
        lens = torch.from_numpy(np.asarray(lengths, dtype=np.int64))
        emb = self.embed(bank_t)
        packed = torch.nn.utils.rnn.pack_padded_sequence(
            emb, lens.clamp(min=1), batch_first=True, enforce_sorted=False)
        _, h_n = self.gru(packed)            # [2, P, H]
        h = torch.cat([h_n[0], h_n[1]], dim=-1)
        out = self.out_proj(h)
        out[lens == 0] = 0.0                 # pad paths encode to zero
        return out.numpy()


class TorchRelationMHA(torch.nn.Module):
    """Dense relation-aware attention exactly as the reference computes it:
    materialize a/b per pair, e = scale*(q+a).(k+b), masked softmax, out."""

    def __init__(self, flax_params: dict, d_model: int, heads: int):
        super().__init__()
        p = flax_params["params"]

        def lin(name):
            l = torch.nn.Linear(*reversed(np.asarray(p[name]["kernel"]).shape))
            l.weight.data = _t(p[name]["kernel"]).T
            l.bias.data = _t(p[name]["bias"])
            return l

        self.q, self.k, self.v = lin("q_proj"), lin("k_proj"), lin("v_proj")
        self.rel = lin("rel_proj")
        self.out = lin("out_proj")
        self.d_model, self.heads = d_model, heads

    @torch.no_grad()
    def forward(self, x, rel_vecs, rel_index, node_mask) -> np.ndarray:
        x = _t(x)
        rel_vecs = _t(rel_vecs)
        rel_index = torch.from_numpy(np.asarray(rel_index, dtype=np.int64))
        node_mask = torch.from_numpy(np.asarray(node_mask))
        B, N, D = x.shape
        H, Dh = self.heads, D // self.heads
        q = self.q(x).view(B, N, H, Dh)
        k = self.k(x).view(B, N, H, Dh)
        v = self.v(x).view(B, N, H, Dh)
        ab = self.rel(rel_vecs)              # [P, 2D]
        a_bank = ab[:, :D].view(-1, H, Dh)
        b_bank = ab[:, D:].view(-1, H, Dh)
        a_pair = a_bank[rel_index]           # [B,N,N,H,Dh]
        b_pair = b_bank[rel_index]
        # e[b,h,i,j] = (q_i + a_ij) . (k_j + b_ij) * scale
        qe = q[:, :, None] + a_pair          # [B,N,N,H,Dh]
        ke = k[:, None, :] + b_pair
        e = (qe * ke).sum(-1).permute(0, 3, 1, 2) * (Dh ** -0.5)
        e = e.masked_fill(~node_mask[:, None, None, :], -1e9)
        attn = torch.softmax(e, dim=-1)
        outh = torch.einsum("bhij,bjhd->bihd", attn, v).reshape(B, N, D)
        return self.out(outh).numpy()


class TorchCharCNN(torch.nn.Module):
    """Masked multi-width char conv + maxpool matching gtos_tpu CharCNN."""

    def __init__(self, flax_params: dict, vocab: int, char_dim: int,
                 filters: int, widths, out_dim: int):
        super().__init__()
        p = flax_params["params"]
        self.embed = torch.nn.Embedding(vocab, char_dim)
        self.embed.weight.data = _t(p["char_embed"]["embedding"])
        self.convs = torch.nn.ModuleList()
        self.widths = tuple(widths)
        for w in self.widths:
            conv = torch.nn.Conv1d(char_dim, filters, w, padding=w // 2)
            # flax Conv kernel [width, in, out] -> torch [out, in, width]
            conv.weight.data = _t(p[f"conv{w}"]["kernel"]).permute(2, 1, 0)
            conv.bias.data = _t(p[f"conv{w}"]["bias"])
            self.convs.append(conv)
        self.proj = torch.nn.Linear(filters * len(self.widths), out_dim)
        self.proj.weight.data = _t(p["char_proj"]["kernel"]).T
        self.proj.bias.data = _t(p["char_proj"]["bias"])

    @torch.no_grad()
    def forward(self, chars: np.ndarray) -> np.ndarray:
        chars_t = torch.from_numpy(np.asarray(chars, dtype=np.int64))
        B, N, C = chars_t.shape
        emb = self.embed(chars_t).view(B * N, C, -1).transpose(1, 2)  # [BN,dc,C]
        pad = (chars_t.view(B * N, C) != 0)
        pooled = []
        for conv in self.convs:
            h = torch.relu(conv(emb))                    # [BN,f,C]
            h = h.masked_fill(~pad[:, None, :], -1e9)
            pooled.append(h.max(dim=2).values)
        h = torch.cat(pooled, dim=-1)
        h[~pad.any(dim=1)] = 0.0
        out = self.proj(h)
        return out.view(B, N, -1).numpy()


class TorchDecoderLayer(torch.nn.Module):
    """Causal self-attn + cross-attn + FFN with post-LN residuals, matching
    gtos_tpu DecoderLayer (weights loaded from the flax params)."""

    def __init__(self, flax_params: dict, d_model: int, heads: int):
        super().__init__()
        p = flax_params["params"]
        self.d_model, self.heads = d_model, heads

        def lin(mod, name):
            sub = p[mod][name]
            l = torch.nn.Linear(*reversed(np.asarray(sub["kernel"]).shape))
            l.weight.data = _t(sub["kernel"]).T
            l.bias.data = _t(sub["bias"])
            return l

        def ln(mod):
            sub = p[mod]["ln"]
            l = torch.nn.LayerNorm(d_model)
            l.weight.data = _t(sub["scale"])
            l.bias.data = _t(sub["bias"])
            return l

        self.sq, self.sk, self.sv, self.so = (
            lin("self_attn", n) for n in ("q_proj", "k_proj", "v_proj", "out_proj"))
        self.cq, self.ck, self.cv, self.co = (
            lin("cross_attn", n) for n in ("q_proj", "k_proj", "v_proj", "out_proj"))
        self.fc1 = lin("ffn", "fc1")
        self.fc2 = lin("ffn", "fc2")
        self.ln_self = ln("self_res")
        self.ln_cross = ln("cross_res")
        self.ln_ffn = ln("ffn_res")

    def _attend(self, q, k, v, mask=None):
        B, Tq, D = q.shape
        Tk = k.shape[1]
        H, Dh = self.heads, D // self.heads
        qh = q.view(B, Tq, H, Dh).transpose(1, 2)
        kh = k.view(B, Tk, H, Dh).transpose(1, 2)
        vh = v.view(B, Tk, H, Dh).transpose(1, 2)
        scores = qh @ kh.transpose(-1, -2) * (Dh ** -0.5)
        if mask is not None:
            scores = scores.masked_fill(~mask, -1e9)
        probs = torch.softmax(scores, dim=-1)
        out = (probs @ vh).transpose(1, 2).reshape(B, Tq, D)
        return out, probs

    @torch.no_grad()
    def forward(self, x, mem, mem_mask) -> np.ndarray:
        x = _t(x)
        mem = _t(mem)
        mem_mask = torch.from_numpy(np.asarray(mem_mask))
        B, T, D = x.shape
        causal = torch.tril(torch.ones(T, T, dtype=torch.bool))[None, None]
        sa, _ = self._attend(self.sq(x), self.sk(x), self.sv(x), causal)
        x = self.ln_self(x + self.so(sa))
        ca, probs = self._attend(self.cq(x), self.ck(mem), self.cv(mem),
                                 mem_mask[:, None, None, :])
        x = self.ln_cross(x + self.co(ca))
        ff = self.fc2(torch.relu(self.fc1(x)))
        x = self.ln_ffn(x + ff)
        return x.numpy(), probs.numpy()


def torch_copy_mix(logits, align_probs, gate_logit, cp_seq, copy_mask,
                   ext_vocab: int) -> np.ndarray:
    """Reference copy mixture: P = g*softmax(logits) + (1-g)*scatter(alpha),
    alpha = head-mean cross-attn masked to copyable nodes, renormalized."""
    logits = _t(logits)
    alpha = _t(align_probs).mean(-2)
    cm = torch.from_numpy(np.asarray(copy_mask))
    cp = torch.from_numpy(np.asarray(cp_seq, dtype=np.int64))
    alpha = alpha.masked_fill(~cm[:, None, :], 0.0)
    alpha = alpha / (alpha.sum(-1, keepdim=True) + 1e-9)
    g = torch.sigmoid(_t(gate_logit))
    p_vocab = torch.softmax(logits, dim=-1)
    B, T, V = p_vocab.shape
    ext = torch.zeros(B, T, ext_vocab)
    ext[..., :V] = g * p_vocab
    ext.scatter_add_(2, cp[:, None, :].expand(B, T, cp.shape[1]),
                     (1 - g) * alpha)
    return torch.log(ext + 1e-9).numpy()
