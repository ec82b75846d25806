"""Torch replica of the reference MI training step — a TEST ORACLE only.

Re-implements, in plain torch, the pieces of
``/root/reference/mutual_info_img_txt`` needed to golden-test one full MI
training step against real torch math: the ResNet256_6_2_1 encoder
(model.py:272-369; same state-dict key layout so the repo's .bin
converters drive the weight exchange), TextBert as HF BertModel + head
(model.py:54-81), the make_mlp critic (model.py:18-48), the pair
enumeration (main_utils.py:80-110), the DV bound (mi_critics.py:3-12), and
the pytorch_transformers-1.0.0 AdamW + WarmupLinearSchedule update rule
(main_utils.py:151-172).  Nothing here ships in the framework; the
production compute path is JAX.

Runnable as a subprocess oracle: ``python torch_reference.py <work_dir>``
reads weights/batch/config written by test_reference_step_parity.py and
writes embeddings + per-step losses back (out.npz).  The subprocess
isolation is mandatory on this machine: loading jaxlib (whose XLA:CPU
also embeds oneDNN) and running torch oneDNN convs in ONE process
corrupts the heap (`free(): invalid next size` mid-backward), so the
torch side runs in a clean interpreter with the axon sitecustomize
disabled and jax never imported.
"""

import torch
import torch.nn as nn


def conv3x3(inp, out, stride=1):
    return nn.Conv2d(inp, out, kernel_size=3, stride=stride, padding=1,
                     bias=False)


def conv1x1(inp, out, stride=1):
    return nn.Conv2d(inp, out, kernel_size=1, stride=stride, bias=False)


class BasicBlock(nn.Module):
    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = conv3x3(inplanes, planes, stride)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = conv3x3(planes, planes)
        self.bn2 = nn.BatchNorm2d(planes)
        self.downsample = downsample

    def forward(self, x):
        identity = x if self.downsample is None else self.downsample(x)
        out = torch.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return torch.relu(out + identity)


class ResNet256_6_2_1(nn.Module):
    """Same module/key layout as the reference encoder (conv1, bn1,
    layer1..layer6 as Sequentials of BasicBlocks, fc1); forward returns the
    5-tuple (y, z, y_sigmoid, z_local, y_logits)."""

    PLANES = (8, 16, 32, 64, 128, 192)

    def __init__(self, blocks_per_layer=(2,) * 6, output_channels=1):
        super().__init__()
        self.conv1 = conv3x3(1, 8, stride=1)
        self.bn1 = nn.BatchNorm2d(8)
        inplanes = 8
        for li, (planes, blocks) in enumerate(zip(self.PLANES,
                                                  blocks_per_layer)):
            layers = []
            for bi in range(blocks):
                stride = 2 if bi == 0 else 1
                down = None
                if bi == 0 and (stride != 1 or inplanes != planes):
                    down = nn.Sequential(conv1x1(inplanes, planes, stride),
                                         nn.BatchNorm2d(planes))
                layers.append(BasicBlock(inplanes, planes, stride, down))
                inplanes = planes
            setattr(self, f"layer{li + 1}", nn.Sequential(*layers))
        self.avgpool = nn.AvgPool2d((2, 2))
        self.fc1 = nn.Linear(768, output_channels)

    def forward(self, x):
        x = torch.relu(self.bn1(self.conv1(x)))
        for li in range(1, 5):
            x = getattr(self, f"layer{li}")(x)
        z_local = self.layer5(x)
        x = self.layer6(z_local)
        x = self.avgpool(x)
        z = torch.flatten(x, 1)
        y_logits = self.fc1(z)
        return (torch.softmax(y_logits, dim=1), z, torch.sigmoid(y_logits),
                z_local, y_logits)


class TorchTextBert(nn.Module):
    """HF BertModel + dropout + classifier head, keyed 'bert.*' /
    'classifier.*' like the reference TextBert; forward returns
    (pooled_embedding, logits)."""

    def __init__(self, hf_config, num_classes=1):
        import transformers

        super().__init__()
        self.bert = transformers.BertModel(hf_config)
        self.dropout = nn.Dropout(hf_config.hidden_dropout_prob)
        self.classifier = nn.Linear(hf_config.hidden_size, num_classes)

    def forward(self, input_ids, attention_mask, token_type_ids):
        out = self.bert(input_ids=input_ids, attention_mask=attention_mask,
                        token_type_ids=token_type_ids)
        pooled = self.dropout(out.pooler_output)
        return pooled, self.classifier(pooled)


def make_mlp(input_dim, hidden_dims, output_dim=1):
    """Sequential Linear/ReLU stack, indices 0,2,4,... like the reference
    (matches mlp_state_dict_from_params(sequential=True))."""
    layers, d = [], input_dim
    for h in hidden_dims:
        layers += [nn.Linear(d, h), nn.ReLU()]
        d = h
    layers.append(nn.Linear(d, output_dim))
    return nn.Sequential(*layers)


def create_mi_pairs(embedding_img, embedding_txt, study_ids):
    """The reference pair enumeration: B positive rows, then for
    gap=1..B-1, i=0..B-1 the wrapped (i, (i+gap) % B) negatives where study
    ids differ."""
    b = len(study_ids)
    rows = [torch.cat((embedding_img, embedding_txt), 1)]
    for gap in range(b - 1):
        for i in range(b):
            j = i + gap + 1
            if j >= b:
                j -= b
            if study_ids[i] != study_ids[j]:
                rows.append(torch.cat((embedding_img[i],
                                       embedding_txt[j])).reshape(1, -1))
    return torch.cat(rows, 0)


def dv_bound_loss(logits, pos_size):
    pos = torch.mean(logits[:pos_size])
    n_neg = logits.shape[0] - pos_size
    neg = torch.logsumexp(logits[pos_size:], dim=0) \
        - torch.log(torch.tensor(float(n_neg)))
    return neg - pos


def warmup_linear(step, warmup, t_total):
    if step < warmup:
        return step / max(1.0, warmup)
    return max(0.0, (t_total - step) / max(1.0, t_total - warmup))


NO_DECAY = ("bias", "LayerNorm.bias", "LayerNorm.weight")


class AdamWHF:
    """pytorch_transformers-1.0.0 AdamW with correct_bias=False under a
    warmup-linear LambdaLR: update = lr_t * m/(sqrt(v)+eps) (+ lr_t*wd*p
    for decayed params), lr_t evaluated at COMPLETED steps."""

    def __init__(self, named_params, base_lr, warmup, t_total,
                 weight_decay=0.1, b1=0.9, b2=0.999, eps=1e-6):
        self.named = list(named_params)
        self.base_lr, self.warmup, self.t_total = base_lr, warmup, t_total
        self.wd, self.b1, self.b2, self.eps = weight_decay, b1, b2, eps
        self.m = {n: torch.zeros_like(p) for n, p in self.named}
        self.v = {n: torch.zeros_like(p) for n, p in self.named}
        self.count = 0

    @torch.no_grad()
    def step(self):
        lr = self.base_lr * warmup_linear(self.count, self.warmup,
                                          self.t_total)
        for n, p in self.named:
            if p.grad is None:
                continue
            g = p.grad
            self.m[n].mul_(self.b1).add_(g, alpha=1 - self.b1)
            self.v[n].mul_(self.b2).addcmul_(g, g, value=1 - self.b2)
            p.add_(self.m[n] / (self.v[n].sqrt() + self.eps), alpha=-lr)
            if self.wd > 0 and not any(nd in n for nd in NO_DECAY):
                p.add_(p, alpha=-lr * self.wd)
        self.count += 1

    def zero_grad(self):
        for _, p in self.named:
            p.grad = None


def _load_sd(path):
    import numpy as np

    with np.load(path) as z:
        return {k: torch.tensor(z[k]) for k in z.files}


def main(work_dir):
    """Subprocess oracle: replay the reference MI step on weights/batches
    prepared by the jax side (see module docstring)."""
    import json
    import os

    import numpy as np
    import transformers

    torch.manual_seed(0)
    torch.set_num_threads(1)
    with open(os.path.join(work_dir, "config.json")) as f:
        c = json.load(f)

    f64 = c.get("dtype") == "float64"
    resnet = ResNet256_6_2_1(output_channels=c["output_channels"])
    resnet.load_state_dict(_load_sd(os.path.join(work_dir, "img_sd.npz")))
    hf_cfg = transformers.BertConfig(
        vocab_size=c["vocab_size"], hidden_size=c["hidden_size"],
        num_hidden_layers=c["num_hidden_layers"],
        num_attention_heads=c["num_attention_heads"],
        intermediate_size=c["intermediate_size"],
        max_position_embeddings=c["max_position_embeddings"],
        type_vocab_size=2, hidden_act="gelu", hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, layer_norm_eps=1e-12)
    bert = TorchTextBert(hf_cfg, num_classes=c["output_channels"])
    missing, unexpected = bert.load_state_dict(
        _load_sd(os.path.join(work_dir, "txt_sd.npz")), strict=False)
    assert not unexpected, unexpected
    assert all("position_ids" in k for k in missing), missing
    critic = make_mlp(c["critic_in"], c["critic_hidden"])
    critic.load_state_dict(_load_sd(os.path.join(work_dir, "critic_sd.npz")))
    if c.get("perturb_scale"):
        # noise-band oracle run: multiplicatively perturb every weight at
        # the given relative scale (seeded Rademacher signs).  Two torch
        # runs — exact and perturbed-at-rounding-scale — bound how fast
        # fp32 accumulation-order noise diverges through the chaotic
        # low-loss DV landscape; an exact second implementation (the jax
        # side) must stay within that divergence envelope.
        gen = torch.Generator().manual_seed(1234)
        with torch.no_grad():
            for module in (resnet, bert, critic):
                for p in module.parameters():
                    signs = torch.randint(0, 2, p.shape, generator=gen,
                                          dtype=p.dtype) * 2 - 1
                    p.mul_(1 + c["perturb_scale"] * signs)
    if f64:
        # float64 golden mode: fp32 conv accumulation-order noise (oneDNN
        # vs XLA) would otherwise swamp the comparison after a few
        # chaotic low-loss optimizer steps
        resnet.double()
        bert.double()
        critic.double()

    with np.load(os.path.join(work_dir, "batch.npz")) as z:
        img_np = z["image_nchw"]
        if img_np.ndim == 4:  # single batch -> trajectory of length 1
            img_np = img_np[None]
            ids_np = z["txt_ids"][None]
            masks_np = z["txt_masks"][None]
            segs_np = z["txt_segments"][None]
            sids_np = z["study_id"][None]
        else:  # stacked (N, B, ...) batch trajectory
            ids_np = z["txt_ids"]
            masks_np = z["txt_masks"]
            segs_np = z["txt_segments"]
            sids_np = z["study_id"]
        imgs = torch.tensor(img_np.astype(np.float64 if f64 else np.float32))
        idss = torch.tensor(ids_np.astype(np.int64))
        maskss = torch.tensor(masks_np.astype(np.int64))
        segss = torch.tensor(segs_np.astype(np.int64))
        sidss = [[str(int(s)) for s in row] for row in sids_np]
        n_batches = imgs.shape[0]
        img, ids, masks, segs, sids = (imgs[0], idss[0], maskss[0], segss[0],
                                       sidss[0])

    resnet.train()
    bert.train()
    with torch.no_grad():
        z_fwd = resnet(img)[1].numpy()
        et_fwd = bert(ids, masks, segs)[0].numpy()

    img_opt = torch.optim.Adam(resnet.parameters(), lr=c["init_lr"])
    mi_opt = torch.optim.Adam(critic.parameters(), lr=c["init_lr"])
    adamw = AdamWHF(bert.named_parameters(), base_lr=c["bert_lr"],
                    warmup=c["warmup"], t_total=c["t_total"],
                    weight_decay=0.1)
    losses = []
    for s in range(c["steps"]):
        k = s % n_batches
        img, ids, masks, segs, sids = (imgs[k], idss[k], maskss[k], segss[k],
                                       sidss[k])
        ei = resnet(img)[1]
        et = bert(ids, masks, segs)[0]
        mi_input = create_mi_pairs(ei, et, sids)
        logits = critic(mi_input)[:, 0]
        loss = dv_bound_loss(logits, img.shape[0])
        img_opt.zero_grad(set_to_none=True)
        mi_opt.zero_grad(set_to_none=True)
        adamw.zero_grad()
        loss.backward()
        img_opt.step()
        mi_opt.step()
        adamw.step()
        losses.append(float(loss.detach()))

    np.savez(os.path.join(work_dir, "out.npz"), z_fwd=z_fwd, et_fwd=et_fwd,
             losses=np.asarray(losses, np.float64))




# ---------------------------------------------------------------------------
# ResNetAE replica (reference autoencoder_model.py:16-215) — same module /
# state-dict key layout (encoder.input_conv.0, res_blk_list.i.b.residual_block.k,
# conv_list.i.0, multi_res_skip_list.i.0, output_conv, fc1/fc2) so the repo's
# ae_*_state_dict converters drive the weight exchange.
# ---------------------------------------------------------------------------


class AEResidualBlock(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.residual_block = nn.Sequential(
            nn.Conv2d(ch, ch, 3, 1, padding=1), nn.BatchNorm2d(ch),
            nn.LeakyReLU(0.2, inplace=True),
            nn.Conv2d(ch, ch, 3, 1, padding=1), nn.BatchNorm2d(ch),
            nn.LeakyReLU(0.2, inplace=True))

    def forward(self, x):
        return x + self.residual_block(x)


def _conv_bn_lrelu(cin, cout, k, s, pad=0, transpose=False):
    conv_cls = nn.ConvTranspose2d if transpose else nn.Conv2d
    return nn.Sequential(conv_cls(cin, cout, k, s, padding=pad),
                         nn.BatchNorm2d(cout),
                         nn.LeakyReLU(0.2, inplace=True))


class TorchAEEncoder(nn.Module):
    def __init__(self, n_res, n_levels, input_ch, z_dim):
        super().__init__()
        self.n_levels = n_levels
        max_f = 2 ** (n_levels + 3)
        self.input_conv = _conv_bn_lrelu(input_ch, 8, 3, 1, pad=1)
        self.res_blk_list = nn.ModuleList()
        self.conv_list = nn.ModuleList()
        self.multi_res_skip_list = nn.ModuleList()
        for i in range(n_levels):
            f1, f2 = 2 ** (i + 3), 2 ** (i + 4)
            ks = 2 ** (n_levels - i)
            self.res_blk_list.append(nn.Sequential(
                *[AEResidualBlock(f1) for _ in range(n_res)]))
            self.conv_list.append(_conv_bn_lrelu(f1, f2, 2, 2))
            self.multi_res_skip_list.append(_conv_bn_lrelu(f1, max_f, ks, ks))
        self.output_conv = nn.Conv2d(max_f, z_dim, 3, 1, padding=1)

    def forward(self, x):
        x = self.input_conv(x)
        skips = []
        for i in range(self.n_levels):
            x = self.res_blk_list[i](x)
            skips.append(self.multi_res_skip_list[i](x))
            x = self.conv_list[i](x)
        return self.output_conv(sum([x] + skips))


class TorchAEDecoder(nn.Module):
    def __init__(self, n_res, n_levels, output_ch, z_dim):
        super().__init__()
        self.n_levels = n_levels
        max_f = 2 ** (n_levels + 3)
        self.input_conv = _conv_bn_lrelu(z_dim, max_f, 3, 1, pad=1)
        self.res_blk_list = nn.ModuleList()
        self.conv_list = nn.ModuleList()
        self.multi_res_skip_list = nn.ModuleList()
        for i in range(n_levels):
            f0, f1 = 2 ** (n_levels - i + 3), 2 ** (n_levels - i + 2)
            self.conv_list.append(_conv_bn_lrelu(f0, f1, 2, 2, transpose=True))
            self.res_blk_list.append(nn.Sequential(
                *[AEResidualBlock(f1) for _ in range(n_res)]))
            self.multi_res_skip_list.append(
                _conv_bn_lrelu(max_f, f1, 2 ** (i + 1), 2 ** (i + 1),
                               transpose=True))
        self.output_conv = nn.Conv2d(f1, output_ch, 3, 1, padding=1)

    def forward(self, z):
        z = z_top = self.input_conv(z)
        for i in range(self.n_levels):
            z = self.conv_list[i](z)
            z = self.res_blk_list[i](z)
            z = z + self.multi_res_skip_list[i](z_top)
        return self.output_conv(z)


class TorchResNetAE(nn.Module):
    def __init__(self, input_shape=(256, 256, 1), n_res=2, n_levels=6,
                 z_dim=192, bottleneck_dim=768):
        super().__init__()
        self.z_dim = z_dim
        self.lat = input_shape[0] // (2 ** n_levels)
        self.encoder = TorchAEEncoder(n_res, n_levels, input_shape[2], z_dim)
        self.decoder = TorchAEDecoder(n_res, n_levels, input_shape[2], z_dim)
        flat = z_dim * self.lat * self.lat
        self.fc1 = nn.Linear(flat, bottleneck_dim)
        self.fc2 = nn.Linear(bottleneck_dim, flat)

    def encode(self, x):
        h = self.encoder(x)
        return self.fc1(h.reshape(-1, self.z_dim * self.lat * self.lat))

    def decode(self, z):
        h = self.fc2(z).reshape(-1, self.z_dim, self.lat, self.lat)
        return torch.sigmoid(self.decoder(h))

    def forward(self, x):
        return self.decode(self.encode(x))


def ae_main(work_dir):
    """Subprocess oracle for the AE training step (reference
    main_utils.py:610-703: MSELoss + single Adam(init_lr), BN train mode)."""
    import json
    import os

    import numpy as np

    torch.manual_seed(0)
    torch.set_num_threads(1)
    with open(os.path.join(work_dir, "config.json")) as f:
        c = json.load(f)
    model = TorchResNetAE(input_shape=tuple(c["input_shape"]),
                          n_res=c["n_res"], n_levels=c["n_levels"],
                          z_dim=c["z_dim"], bottleneck_dim=c["bottleneck_dim"])
    sd = _load_sd(os.path.join(work_dir, "ae_sd.npz"))
    missing, unexpected = model.load_state_dict(sd, strict=False)
    assert not unexpected, unexpected
    assert not missing, missing
    if c.get("dtype") == "float64":
        model.double()
    with np.load(os.path.join(work_dir, "batch.npz")) as z:
        img = torch.tensor(z["image_nchw"].astype(
            np.float64 if c.get("dtype") == "float64" else np.float32))

    model.train()
    opt = torch.optim.Adam(model.parameters(), lr=c["init_lr"])
    crit = nn.MSELoss()
    losses = []
    for _ in range(c["steps"]):
        out = model(img)
        loss = crit(out, img)
        opt.zero_grad(set_to_none=True)
        loss.backward()
        opt.step()
        losses.append(float(loss.detach()))
    np.savez(os.path.join(work_dir, "out.npz"),
             losses=np.asarray(losses, np.float64))


# ---------------------------------------------------------------------------
# Basic_MLP classifier replica (reference model.py:154-214) — ``layers.N``
# ModuleList key layout (matches mlp_state_dict_from_params(sequential=False)).
# ---------------------------------------------------------------------------


class TorchBasicMLP(nn.Module):
    def __init__(self, input_dim, hidden_dims, output_dim=1, dropout=0.0):
        super().__init__()
        dims = [input_dim, *hidden_dims, output_dim]
        self.layers = nn.ModuleList(
            [nn.Linear(dims[i], dims[i + 1]) for i in range(len(dims) - 1)])
        self.dropout = nn.Dropout(dropout)

    def forward(self, x):
        for lin in list(self.layers)[:-1]:
            x = self.dropout(torch.relu(lin(x)))
        return torch.sigmoid(self.layers[-1](x))


def clf_main(work_dir):
    """Subprocess oracle for the downstream classifier step (reference
    main_utils.py:318-426): frozen-encoder embeddings (precomputed — the
    encoders have their own goldens) -> Basic_MLP -> BCELoss -> Adam or
    SGD(wd=1e-8, momentum=9e-4, nesterov) under ExponentialLR(0.9)
    stepped per epoch."""
    import json
    import os

    import numpy as np

    torch.manual_seed(0)
    torch.set_num_threads(1)
    with open(os.path.join(work_dir, "config.json")) as f:
        c = json.load(f)
    model = TorchBasicMLP(c["input_dim"], c["hidden_dims"], dropout=0.0)
    model.load_state_dict(_load_sd(os.path.join(work_dir, "clf_sd.npz")))
    f64 = c.get("dtype") == "float64"
    if f64:
        model.double()
    with np.load(os.path.join(work_dir, "batch.npz")) as z:
        emb = torch.tensor(z["emb"].astype(np.float64 if f64 else np.float32))
        labels = torch.tensor(z["labels"].astype(
            np.float64 if f64 else np.float32))

    if c["optimizer"] == "Adam":
        opt = torch.optim.Adam(model.parameters(), lr=c["init_lr"])
    else:
        opt = torch.optim.SGD(model.parameters(), lr=c["init_lr"],
                              momentum=9e-4, weight_decay=1e-8, nesterov=True)
    crit = nn.BCELoss()
    model.train()
    losses = []
    for t in range(c["steps"]):
        # ExponentialLR(0.9) stepped once per epoch (reference
        # main_utils.py:346,419): constant within an epoch
        lr = c["init_lr"] * 0.9 ** (t // c["steps_per_epoch"])
        for grp in opt.param_groups:
            grp["lr"] = lr
        out = model(emb)[:, 0]
        loss = crit(out, labels)
        opt.zero_grad(set_to_none=True)
        loss.backward()
        opt.step()
        losses.append(float(loss.detach()))
    np.savez(os.path.join(work_dir, "out.npz"),
             losses=np.asarray(losses, np.float64))


if __name__ == "__main__":
    import json as _json
    import os as _os
    import sys

    with open(_os.path.join(sys.argv[1], "config.json")) as _f:
        _mode = _json.load(_f).get("mode", "mi")
    ({"ae": ae_main, "clf": clf_main}.get(_mode, main))(sys.argv[1])
