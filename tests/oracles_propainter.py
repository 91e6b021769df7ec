"""Hand-written torch oracles mirroring the public ProPainter stack.

ProPainter's real compute lives in packages absent from the reference
mount (SURVEY.md §2c [external]); these modules re-state the published
architectures (RAFT, Teed & Deng 2020; ProPainter, Zhou et al. 2023)
with state-dict keys matching the released checkpoints
(raft-things.pth / recurrent_flow_completion.pth / ProPainter.pth,
consumed via diffuerase.py:49-57) so that:
  1. core/convert.py's rule sets are exercised on realistic key layouts,
  2. the flax modules are parity-gated against an independent torch
     implementation with CONVERTED random weights.
Written from the published architecture descriptions — not copied from
any repository.
"""
import torch
import torch.nn as nn
import torch.nn.functional as F


# ---------------------------------------------------------------------------
# RAFT
# ---------------------------------------------------------------------------
class ResidualBlock(nn.Module):
    def __init__(self, in_planes, planes, norm_fn="instance", stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(in_planes, planes, 3, padding=1,
                               stride=stride)
        self.conv2 = nn.Conv2d(planes, planes, 3, padding=1)
        self.relu = nn.ReLU(inplace=True)

        def make_norm():
            if norm_fn == "batch":
                return nn.BatchNorm2d(planes)
            if norm_fn == "instance":
                return nn.InstanceNorm2d(planes)
            return nn.Sequential()

        self.norm1 = make_norm()
        self.norm2 = make_norm()
        if stride == 1:
            self.downsample = None
        else:
            self.downsample = nn.Sequential(
                nn.Conv2d(in_planes, planes, 1, stride=stride), make_norm())

    def forward(self, x):
        y = self.relu(self.norm1(self.conv1(x)))
        y = self.relu(self.norm2(self.conv2(y)))
        if self.downsample is not None:
            x = self.downsample(x)
        return self.relu(x + y)


class BasicEncoder(nn.Module):
    def __init__(self, output_dim=256, norm_fn="instance"):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3)
        self.norm1 = nn.BatchNorm2d(64) if norm_fn == "batch" \
            else nn.InstanceNorm2d(64)
        self.relu1 = nn.ReLU(inplace=True)
        self.layer1 = nn.Sequential(ResidualBlock(64, 64, norm_fn, 1),
                                    ResidualBlock(64, 64, norm_fn, 1))
        self.layer2 = nn.Sequential(ResidualBlock(64, 96, norm_fn, 2),
                                    ResidualBlock(96, 96, norm_fn, 1))
        self.layer3 = nn.Sequential(ResidualBlock(96, 128, norm_fn, 2),
                                    ResidualBlock(128, 128, norm_fn, 1))
        self.conv2 = nn.Conv2d(128, output_dim, 1)

    def forward(self, x):
        x = self.relu1(self.norm1(self.conv1(x)))
        x = self.layer3(self.layer2(self.layer1(x)))
        return self.conv2(x)


def bilinear_sampler(img, coords):
    """grid_sample at absolute pixel coords, align_corners=True, zeros."""
    H, W = img.shape[-2:]
    xgrid, ygrid = coords.split([1, 1], dim=-1)
    xgrid = 2 * xgrid / (W - 1) - 1
    ygrid = 2 * ygrid / (H - 1) - 1
    grid = torch.cat([xgrid, ygrid], dim=-1)
    return F.grid_sample(img, grid, align_corners=True)


class CorrBlock:
    def __init__(self, fmap1, fmap2, num_levels=4, radius=4):
        self.num_levels = num_levels
        self.radius = radius
        b, d, h, w = fmap1.shape
        f1 = fmap1.view(b, d, h * w)
        f2 = fmap2.view(b, d, h * w)
        corr = torch.matmul(f1.transpose(1, 2), f2)
        corr = corr.view(b * h * w, 1, h, w) / torch.sqrt(
            torch.tensor(d).float())
        self.shape = (b, h, w)
        self.pyramid = [corr]
        for _ in range(num_levels - 1):
            corr = F.avg_pool2d(corr, 2, stride=2)
            self.pyramid.append(corr)

    def __call__(self, coords):
        r = self.radius
        coords = coords.permute(0, 2, 3, 1)  # (b, h, w, 2) as (x, y)
        b, h, w, _ = coords.shape
        out = []
        for i in range(self.num_levels):
            corr = self.pyramid[i]
            d = torch.linspace(-r, r, 2 * r + 1)
            # the published lookup builds the offset grid with
            # meshgrid(dy, dx) but consumes axis 0 as the x offset
            delta = torch.stack(torch.meshgrid(d, d, indexing="ij"), dim=-1)
            centroid = coords.reshape(b * h * w, 1, 1, 2) / 2 ** i
            sampled = bilinear_sampler(corr,
                                       centroid + delta.view(1, 2 * r + 1,
                                                             2 * r + 1, 2))
            out.append(sampled.view(b, h, w, -1))
        return torch.cat(out, dim=-1).permute(0, 3, 1, 2).contiguous()


class BasicMotionEncoder(nn.Module):
    def __init__(self, corr_levels=4, corr_radius=4):
        super().__init__()
        cor_planes = corr_levels * (2 * corr_radius + 1) ** 2
        self.convc1 = nn.Conv2d(cor_planes, 256, 1)
        self.convc2 = nn.Conv2d(256, 192, 3, padding=1)
        self.convf1 = nn.Conv2d(2, 128, 7, padding=3)
        self.convf2 = nn.Conv2d(128, 64, 3, padding=1)
        self.conv = nn.Conv2d(64 + 192, 128 - 2, 3, padding=1)

    def forward(self, flow, corr):
        cor = F.relu(self.convc1(corr))
        cor = F.relu(self.convc2(cor))
        flo = F.relu(self.convf1(flow))
        flo = F.relu(self.convf2(flo))
        out = F.relu(self.conv(torch.cat([cor, flo], dim=1)))
        return torch.cat([out, flow], dim=1)


class SepConvGRU(nn.Module):
    def __init__(self, hidden_dim=128, input_dim=256):
        super().__init__()
        hi = hidden_dim + input_dim
        self.convz1 = nn.Conv2d(hi, hidden_dim, (1, 5), padding=(0, 2))
        self.convr1 = nn.Conv2d(hi, hidden_dim, (1, 5), padding=(0, 2))
        self.convq1 = nn.Conv2d(hi, hidden_dim, (1, 5), padding=(0, 2))
        self.convz2 = nn.Conv2d(hi, hidden_dim, (5, 1), padding=(2, 0))
        self.convr2 = nn.Conv2d(hi, hidden_dim, (5, 1), padding=(2, 0))
        self.convq2 = nn.Conv2d(hi, hidden_dim, (5, 1), padding=(2, 0))

    def forward(self, h, x):
        for convz, convr, convq in [(self.convz1, self.convr1, self.convq1),
                                    (self.convz2, self.convr2, self.convq2)]:
            hx = torch.cat([h, x], dim=1)
            z = torch.sigmoid(convz(hx))
            r = torch.sigmoid(convr(hx))
            q = torch.tanh(convq(torch.cat([r * h, x], dim=1)))
            h = (1 - z) * h + z * q
        return h


class FlowHead(nn.Module):
    def __init__(self, input_dim=128, hidden_dim=256):
        super().__init__()
        self.conv1 = nn.Conv2d(input_dim, hidden_dim, 3, padding=1)
        self.conv2 = nn.Conv2d(hidden_dim, 2, 3, padding=1)

    def forward(self, x):
        return self.conv2(F.relu(self.conv1(x)))


class BasicUpdateBlock(nn.Module):
    def __init__(self):
        super().__init__()
        self.encoder = BasicMotionEncoder()
        self.gru = SepConvGRU(128, 128 + 128)
        self.flow_head = FlowHead(128, 256)
        self.mask = nn.Sequential(nn.Conv2d(128, 256, 3, padding=1),
                                  nn.ReLU(inplace=True),
                                  nn.Conv2d(256, 64 * 9, 1))

    def forward(self, net, inp, corr, flow):
        motion = self.encoder(flow, corr)
        net = self.gru(net, torch.cat([inp, motion], dim=1))
        delta_flow = self.flow_head(net)
        mask = 0.25 * self.mask(net)
        return net, mask, delta_flow


class RAFT(nn.Module):
    """Large config (hdim=cdim=128). Input in [-1, 1], NCHW."""

    def __init__(self, iters=20):
        super().__init__()
        self.iters = iters
        self.fnet = BasicEncoder(256, "instance")
        self.cnet = BasicEncoder(256, "batch")
        self.update_block = BasicUpdateBlock()

    @staticmethod
    def coords_grid(b, h, w):
        gy, gx = torch.meshgrid(torch.arange(h).float(),
                                torch.arange(w).float(), indexing="ij")
        return torch.stack([gx, gy], dim=0)[None].repeat(b, 1, 1, 1)

    def upsample_flow(self, flow, mask):
        N, _, H, W = flow.shape
        mask = mask.view(N, 1, 9, 8, 8, H, W)
        mask = torch.softmax(mask, dim=2)
        up = F.unfold(8 * flow, [3, 3], padding=1)
        up = up.view(N, 2, 9, 1, 1, H, W)
        up = torch.sum(mask * up, dim=2)
        up = up.permute(0, 1, 4, 2, 5, 3)
        return up.reshape(N, 2, 8 * H, 8 * W)

    def forward(self, image1, image2):
        f1 = self.fnet(image1)
        f2 = self.fnet(image2)
        corr_fn = CorrBlock(f1, f2)
        cnet = self.cnet(image1)
        net = torch.tanh(cnet[:, :128])
        inp = torch.relu(cnet[:, 128:])
        b, _, h8, w8 = f1.shape
        coords0 = self.coords_grid(b, h8, w8)
        coords1 = coords0.clone()
        up_mask = None
        for _ in range(self.iters):
            corr = corr_fn(coords1)
            flow = coords1 - coords0
            net, up_mask, delta = self.update_block(net, inp, corr, flow)
            coords1 = coords1 + delta
        return self.upsample_flow(coords1 - coords0, up_mask)


# ---------------------------------------------------------------------------
# modulated deformable convolution (torchvision layout, pure-torch
# reference since torchvision is absent on this host)
# ---------------------------------------------------------------------------
def modulated_deform_conv2d_ref(x, offset, mask, weight, bias, padding=1):
    """x (B,Cin,H,W); offset (B, 2*G*K, H, W) channels ordered
    2*(g*K+k)+{0:dy,1:dx}; mask (B, G*K, H, W); weight (Cout,Cin,kh,kw).
    Bilinear sampling with zero padding, stride/dilation 1."""
    B, Cin, H, W = x.shape
    Cout, _, kh, kw = weight.shape
    K = kh * kw
    G = mask.shape[1] // K
    cg = Cin // G
    off = offset.view(B, G, K, 2, H, W)
    m = mask.view(B, G, K, H, W)
    by, bx = torch.meshgrid(torch.arange(H).float(),
                            torch.arange(W).float(), indexing="ij")
    cols = []
    for k in range(K):
        ky, kx = k // kw - padding, k % kw - padding
        per_g = []
        for g in range(G):
            sy = by + ky + off[:, g, k, 0]
            sx = bx + kx + off[:, g, k, 1]
            grid = torch.stack([2 * sx / (W - 1) - 1,
                                2 * sy / (H - 1) - 1], dim=-1)
            samp = F.grid_sample(x[:, g * cg:(g + 1) * cg], grid,
                                 align_corners=True, padding_mode="zeros")
            per_g.append(samp * m[:, g, k:k + 1])
        cols.append(torch.cat(per_g, dim=1))  # (B, Cin, H, W) at tap k
    s = torch.stack(cols, dim=1)  # (B, K, Cin, H, W)
    w = weight.permute(0, 2, 3, 1).reshape(Cout, K, Cin)  # (O, k, c)
    out = torch.einsum("bkchw,okc->bohw", s, w)
    return out + bias.view(1, -1, 1, 1)


class SecondOrderDeformableAlignment(nn.Module):
    """BasicVSR++/ProPainter-style alignment head + modulated deform
    conv, with the deform weight/bias as direct parameters (matching
    the checkpoint's `deform_align.<name>.weight` keys)."""

    def __init__(self, in_channels, out_channels, cond_channels,
                 deform_groups=16, max_residue_magnitude=3.0):
        super().__init__()
        self.deform_groups = deform_groups
        self.max_residue_magnitude = max_residue_magnitude
        self.conv_offset = nn.Sequential(
            nn.Conv2d(cond_channels, out_channels, 3, 1, 1),
            nn.LeakyReLU(0.1, inplace=True),
            nn.Conv2d(out_channels, out_channels, 3, 1, 1),
            nn.LeakyReLU(0.1, inplace=True),
            nn.Conv2d(out_channels, out_channels, 3, 1, 1),
            nn.LeakyReLU(0.1, inplace=True),
            nn.Conv2d(out_channels, 27 * deform_groups, 3, 1, 1),
        )
        self.weight = nn.Parameter(torch.randn(out_channels, in_channels,
                                               3, 3) * 0.02)
        self.bias = nn.Parameter(torch.zeros(out_channels))

    def forward(self, x, cond, flow=None):
        out = self.conv_offset(cond)
        o1, o2, mask = torch.chunk(out, 3, dim=1)
        offset = self.max_residue_magnitude * torch.tanh(
            torch.cat((o1, o2), dim=1))
        if flow is not None:
            offset = offset + flow.flip(1).repeat(1, offset.size(1) // 2,
                                                  1, 1)
        mask = torch.sigmoid(mask)
        return modulated_deform_conv2d_ref(x, offset, mask, self.weight,
                                           self.bias)


# ---------------------------------------------------------------------------
# RecurrentFlowCompleteNet
# ---------------------------------------------------------------------------
class deconv(nn.Module):
    """Published naming: a module holding `self.conv` (state-dict key
    `<scope>.conv.weight`), 2x bilinear upsample then conv."""

    def __init__(self, in_ch, out_ch, kernel_size=3, padding=0):
        super().__init__()
        self.conv = nn.Conv2d(in_ch, out_ch, kernel_size, stride=1,
                              padding=padding)

    def forward(self, x):
        x = F.interpolate(x, scale_factor=2, mode="bilinear",
                          align_corners=True)
        return self.conv(x)


class P3DBlock(nn.Module):
    def __init__(self, in_ch, out_ch, kernel_size, stride, padding):
        super().__init__()
        self.conv1 = nn.Sequential(nn.Conv3d(
            in_ch, out_ch, (1, kernel_size, kernel_size),
            (1, stride, stride), (0, padding, padding)))
        self.conv2 = nn.Sequential(nn.Conv3d(
            out_ch, out_ch, (3, 1, 1), (1, 1, 1), (2, 0, 0),
            dilation=(2, 1, 1)))

    def forward(self, x):
        return self.conv2(self.conv1(x))


class FlowCompPropagation(nn.Module):
    """Second-order deformable propagation, no flow guidance."""

    def __init__(self, channel):
        super().__init__()
        self.channel = channel
        self.deform_align = nn.ModuleDict()
        self.backbone = nn.ModuleDict()
        for i, module in enumerate(["backward_", "forward_"]):
            self.deform_align[module] = SecondOrderDeformableAlignment(
                2 * channel, channel, 3 * channel, deform_groups=16)
            self.backbone[module] = nn.Sequential(
                nn.Conv2d((2 + i) * channel, channel, 3, 1, 1),
                nn.LeakyReLU(0.1, inplace=True),
                nn.Conv2d(channel, channel, 3, 1, 1))
        self.fusion = nn.Conv2d(2 * channel, channel, 1, 1, 0)

    def forward(self, x):
        b, t, c, h, w = x.shape
        feats = {"spatial": [x[:, i] for i in range(t)]}
        for module in ["backward_", "forward_"]:
            feats[module] = []
            frame_idx = list(range(t))
            if "backward" in module:
                frame_idx = frame_idx[::-1]
            feat_prop = x.new_zeros(b, self.channel, h, w)
            for i, idx in enumerate(frame_idx):
                feat_current = feats["spatial"][idx]
                if i > 0:
                    cond_n1 = feat_prop
                    feat_n2 = torch.zeros_like(feat_prop)
                    cond_n2 = torch.zeros_like(cond_n1)
                    if i > 1:
                        feat_n2 = feats[module][-2]
                        cond_n2 = feat_n2
                    cond = torch.cat([cond_n1, feat_current, cond_n2], 1)
                    feat_prop = self.deform_align[module](
                        torch.cat([feat_prop, feat_n2], 1), cond)
                fe = [feat_current] + [feats[k][idx] for k in feats
                                       if k not in ("spatial", module)] \
                    + [feat_prop]
                feat_prop = feat_prop + self.backbone[module](
                    torch.cat(fe, 1))
                feats[module].append(feat_prop)
            if "backward" in module:
                feats[module] = feats[module][::-1]
        out = []
        for i in range(t):
            out.append(self.fusion(torch.cat(
                [feats["backward_"][i], feats["forward_"][i]], 1)))
        return torch.stack(out, 1) + x


class RecurrentFlowCompleteNet(nn.Module):
    def __init__(self):
        super().__init__()
        self.downsample = nn.Sequential(
            nn.Conv3d(3, 32, (1, 5, 5), (1, 2, 2), (0, 2, 2),
                      padding_mode="replicate"),
            nn.LeakyReLU(0.2, inplace=True))
        self.encoder1 = nn.Sequential(
            P3DBlock(32, 32, 3, 1, 1), nn.LeakyReLU(0.2, inplace=True),
            P3DBlock(32, 64, 3, 2, 1), nn.LeakyReLU(0.2, inplace=True))
        self.encoder2 = nn.Sequential(
            P3DBlock(64, 64, 3, 1, 1), nn.LeakyReLU(0.2, inplace=True),
            P3DBlock(64, 128, 3, 2, 1), nn.LeakyReLU(0.2, inplace=True))
        self.mid_dilation = nn.Sequential(
            nn.Conv3d(128, 128, (1, 3, 3), (1, 1, 1), (0, 3, 3),
                      dilation=(1, 3, 3)),
            nn.LeakyReLU(0.2, inplace=True),
            nn.Conv3d(128, 128, (1, 3, 3), (1, 1, 1), (0, 2, 2),
                      dilation=(1, 2, 2)),
            nn.LeakyReLU(0.2, inplace=True),
            nn.Conv3d(128, 128, (1, 3, 3), (1, 1, 1), (0, 1, 1),
                      dilation=(1, 1, 1)),
            nn.LeakyReLU(0.2, inplace=True))
        self.feat_prop_module = FlowCompPropagation(128)
        self.decoder2 = nn.Sequential(
            nn.Conv2d(128, 128, 3, 1, 1), nn.LeakyReLU(0.2, inplace=True),
            deconv(128, 64, 3, 1), nn.LeakyReLU(0.2, inplace=True))
        self.decoder1 = nn.Sequential(
            nn.Conv2d(64, 64, 3, 1, 1), nn.LeakyReLU(0.2, inplace=True),
            deconv(64, 32, 3, 1), nn.LeakyReLU(0.2, inplace=True))
        self.upsample = nn.Sequential(
            nn.Conv2d(32, 32, 3, padding=1),
            nn.LeakyReLU(0.2, inplace=True),
            deconv(32, 2, 3, 1))

    def forward(self, masked_flows, masks):
        # masked_flows (b, t, 2, h, w); masks (b, t, 1, h, w)
        b, t, _, h, w = masked_flows.size()
        inputs = torch.cat([masked_flows, masks], dim=2)
        inputs = inputs.permute(0, 2, 1, 3, 4)  # (b, 3, t, h, w)
        x = self.downsample(inputs)
        e1 = self.encoder1(x)
        e2 = self.encoder2(e1)
        mid = self.mid_dilation(e2)
        mid = mid.permute(0, 2, 1, 3, 4)  # (b, t, 128, h8, w8)
        prop = self.feat_prop_module(mid)
        prop = prop.reshape(-1, 128, h // 8, w // 8)
        e1_2d = e1.permute(0, 2, 1, 3, 4).reshape(-1, 64, h // 4, w // 4)
        d2 = self.decoder2(prop) + e1_2d
        d1 = self.decoder1(d2)
        flow = self.upsample(d1)
        return flow.view(b, t, 2, h, w)


# ---------------------------------------------------------------------------
# InpaintGenerator (ProPainter.pth)
# ---------------------------------------------------------------------------
def flow_warp_t(x, flow, mode="bilinear"):
    """ProPainter flow_warp: grid + flow, grid_sample zeros/align_corners.
    x (B,C,H,W); flow (B,H,W,2) as (dx, dy)."""
    B, C, H, W = x.shape
    gy, gx = torch.meshgrid(torch.arange(H).float(),
                            torch.arange(W).float(), indexing="ij")
    vx = gx[None] + flow[..., 0]
    vy = gy[None] + flow[..., 1]
    grid = torch.stack([2 * vx / (W - 1) - 1, 2 * vy / (H - 1) - 1], dim=-1)
    return F.grid_sample(x, grid, mode=mode, padding_mode="zeros",
                         align_corners=True)


def fb_consistency_check_t(flow_fw, flow_bw, alpha1=0.01, alpha2=0.5):
    flow_bw_warped = flow_warp_t(flow_bw, flow_fw.permute(0, 2, 3, 1))
    flow_diff = flow_fw + flow_bw_warped
    norm = (flow_fw ** 2).sum(1, keepdim=True) \
        + (flow_bw_warped ** 2).sum(1, keepdim=True)
    thresh = alpha1 * norm + alpha2
    return ((flow_diff ** 2).sum(1, keepdim=True) < thresh).float()


class PPEncoder(nn.Module):
    SPEC = ((64, 2, 1), (64, 1, 1), (128, 2, 1), (256, 1, 1), (384, 1, 1),
            (512, 1, 2), (384, 1, 4), (256, 1, 8), (128, 1, 1))
    GROUP = (1, 2, 4, 8, 1)
    INCH = (5, 64, 64, 128, 256, 640, 768, 640, 512)

    def __init__(self):
        super().__init__()
        layers = []
        for (out_ch, st, g), in_ch in zip(self.SPEC, self.INCH):
            layers.append(nn.Conv2d(in_ch, out_ch, 3, st, 1, groups=g))
            layers.append(nn.LeakyReLU(0.2, inplace=True))
        self.layers = nn.ModuleList(layers)

    def forward(self, x):
        bt = x.size(0)
        out = x
        for i, layer in enumerate(self.layers):
            if i == 8:
                x0 = out
                _, _, h, w = x0.size()
            if i > 8 and i % 2 == 0:
                g = self.GROUP[(i - 8) // 2]
                xg = x0.view(bt, g, -1, h, w)
                og = out.view(bt, g, -1, h, w)
                out = torch.cat([xg, og], 2).view(bt, -1, h, w)
            out = layer(out)
        return out


class SoftSplit(nn.Module):
    def __init__(self, channel, hidden):
        super().__init__()
        self.t2t = nn.Unfold((7, 7), padding=(3, 3), stride=(3, 3))
        self.embedding = nn.Linear(channel * 49, hidden)

    def forward(self, x, b, output_size):
        fh = (output_size[0] + 6 - 7) // 3 + 1
        fw = (output_size[1] + 6 - 7) // 3 + 1
        feat = self.t2t(x).permute(0, 2, 1)
        feat = self.embedding(feat)
        return feat.view(b, -1, fh, fw, feat.size(2))


class SoftComp(nn.Module):
    def __init__(self, channel, hidden):
        super().__init__()
        self.embedding = nn.Linear(hidden, channel * 49)
        self.bias_conv = nn.Conv2d(channel, channel, 3, 1, 1)

    def forward(self, x, t, output_size):
        b_ = x.size(0)
        x = x.view(b_, -1, x.size(-1))
        feat = self.embedding(x)
        feat = feat.view(b_ * t, -1, feat.size(2)).permute(0, 2, 1)
        feat = F.fold(feat, output_size=output_size, kernel_size=(7, 7),
                      stride=(3, 3), padding=(3, 3))
        return self.bias_conv(feat)


class SparseWindowAttention(nn.Module):
    def __init__(self, dim=512, n_head=4, window_size=(5, 9),
                 pool_size=(4, 4)):
        super().__init__()
        self.key = nn.Linear(dim, dim)
        self.query = nn.Linear(dim, dim)
        self.value = nn.Linear(dim, dim)
        self.proj = nn.Linear(dim, dim)
        self.n_head = n_head
        self.window_size = window_size
        self.expand_size = tuple((i + 1) // 2 for i in window_size)
        self.pool_layer = nn.Conv2d(dim, dim, kernel_size=pool_size,
                                    stride=pool_size, padding=0, groups=dim)
        wh, ww = window_size
        e0, e1 = self.expand_size
        ms = []
        for corner in range(4):
            m = torch.ones(wh, ww)
            ys = slice(0, wh - e0) if corner < 2 else slice(e0, wh)
            xs = slice(0, ww - e1) if corner % 2 == 0 else slice(e1, ww)
            m[ys, xs] = 0
            ms.append(m)
        self.register_buffer(
            "valid_ind_rolled",
            torch.cat([m.flatten() for m in ms]).nonzero().view(-1),
            persistent=False)

    @staticmethod
    def win_part(x, wh, ww):
        # (T, H, W, C) -> (nW, T, wh*ww, C)
        T, H, W, C = x.shape
        x = x.view(T, H // wh, wh, W // ww, ww, C)
        x = x.permute(1, 3, 0, 2, 4, 5)
        return x.reshape((H // wh) * (W // ww), T, wh * ww, C)

    def forward(self, x, t_ind):
        # x: (T, H, W, C); attend-all-windows variant (mask=None path)
        import math as _m
        T, H, W, C = x.shape
        wh, ww = self.window_size
        e0, e1 = self.expand_size
        hd = C // self.n_head
        n_wh = -(-H // wh)
        n_ww = -(-W // ww)
        newH, newW = n_wh * wh, n_ww * ww
        if (newH, newW) != (H, W):
            x = F.pad(x, (0, 0, 0, newW - W, 0, newH - H))
        q = self.query(x)
        k = self.key(x)
        v = self.value(x)
        ks, vs = k[t_ind], v[t_ind]
        win_q = self.win_part(q, wh, ww)
        win_k = self.win_part(ks, wh, ww)
        win_v = self.win_part(vs, wh, ww)
        rolls = [(-e0, -e1), (-e0, e1), (e0, -e1), (e0, e1)]
        k_roll = torch.cat([self.win_part(
            torch.roll(ks, r, dims=(1, 2)), wh, ww) for r in rolls], dim=2)
        v_roll = torch.cat([self.win_part(
            torch.roll(vs, r, dims=(1, 2)), wh, ww) for r in rolls], dim=2)
        k_roll = k_roll[:, :, self.valid_ind_rolled]
        v_roll = v_roll[:, :, self.valid_ind_rolled]
        pooled = self.pool_layer(
            x[t_ind].permute(0, 3, 1, 2)).permute(0, 2, 3, 1)
        pool_k = self.key(pooled).flatten(1, 2)  # (Tk, P, C)
        pool_v = self.value(pooled).flatten(1, 2)
        nW = n_wh * n_ww
        pool_k = pool_k[None].expand(nW, -1, -1, -1)
        pool_v = pool_v[None].expand(nW, -1, -1, -1)
        k_all = torch.cat([win_k, k_roll, pool_k], dim=2)
        v_all = torch.cat([win_v, v_roll, pool_v], dim=2)

        def heads(a):
            nWa, Ta, S, _ = a.shape
            return a.reshape(nWa, Ta * S, self.n_head, hd) \
                .permute(0, 2, 1, 3)

        qh, kh_, vh = heads(win_q), heads(k_all), heads(v_all)
        att = qh @ kh_.transpose(-2, -1) * (1.0 / _m.sqrt(hd))
        att = att.softmax(-1)
        out = (att @ vh).permute(0, 2, 1, 3) \
            .reshape(nW, T, wh * ww, C)
        out = out.view(n_wh, n_ww, T, wh, ww, C).permute(2, 0, 3, 1, 4, 5)
        out = out.reshape(T, newH, newW, C)[:, :H, :W]
        return self.proj(out)


class FusionFeedForward(nn.Module):
    def __init__(self, dim=512, hidden=1960):
        super().__init__()
        self.fc1 = nn.Sequential(nn.Linear(dim, hidden))
        self.fc2 = nn.Sequential(nn.GELU(), nn.Linear(hidden, dim))

    def forward(self, x, output_size):
        # x: (T, L, dim)
        T, L, _ = x.shape
        x = self.fc1[0](x)
        c = x.size(-1)
        normalizer = x.new_ones(T, L, 49).permute(0, 2, 1)
        normalizer = F.fold(normalizer, output_size=output_size,
                            kernel_size=(7, 7), padding=(3, 3),
                            stride=(3, 3))
        folded = F.fold(x.permute(0, 2, 1), output_size=output_size,
                        kernel_size=(7, 7), padding=(3, 3), stride=(3, 3))
        x = F.unfold(folded / normalizer, kernel_size=(7, 7),
                     padding=(3, 3), stride=(3, 3)).permute(0, 2, 1)
        return self.fc2(x)


class TemporalSparseTransformer(nn.Module):
    def __init__(self, dim=512, n_head=4, window_size=(5, 9),
                 pool_size=(4, 4)):
        super().__init__()
        self.attention = SparseWindowAttention(dim, n_head, window_size,
                                               pool_size)
        self.norm1 = nn.LayerNorm(dim)
        self.norm2 = nn.LayerNorm(dim)
        self.mlp = FusionFeedForward(dim)

    def forward(self, x, fold_size, t_ind):
        # x: (T, fh, fw, C)
        T, fh, fw, C = x.shape
        x = x + self.attention(self.norm1(x), t_ind)
        y = self.norm2(x).view(T, fh * fw, C)
        x = x + self.mlp(y, fold_size).view(T, fh, fw, C)
        return x


class TemporalSparseTransformerBlock(nn.Module):
    def __init__(self, depths=8, dim=512, n_head=4, window_size=(5, 9),
                 pool_size=(4, 4)):
        super().__init__()
        self.transformer = nn.ModuleList(
            [TemporalSparseTransformer(dim, n_head, window_size, pool_size)
             for _ in range(depths)])
        self.depths = depths

    def forward(self, x, fold_size, t_dilation=2):
        T = x.size(0)
        for i in range(self.depths):
            t_ind = list(range(i % t_dilation, T, t_dilation))
            x = self.transformer[i](x, fold_size, t_ind)
        return x


class LearnablePropagation(nn.Module):
    """propainter.py BidirectionalPropagation (learnable=True)."""

    def __init__(self, channel=128):
        super().__init__()
        self.channel = channel
        self.deform_align = nn.ModuleDict()
        self.backbone = nn.ModuleDict()
        for module in ["backward_1", "forward_1"]:
            self.deform_align[module] = SecondOrderDeformableAlignment(
                channel, channel, 2 * channel + 2 + 1 + 2, deform_groups=16)
            self.backbone[module] = nn.Sequential(
                nn.Conv2d(2 * channel + 2, channel, 3, 1, 1),
                nn.LeakyReLU(0.2, inplace=True),
                nn.Conv2d(channel, channel, 3, 1, 1))
        self.fuse = nn.Sequential(
            nn.Conv2d(2 * channel + 2, channel, 3, 1, 1),
            nn.LeakyReLU(0.2, inplace=True),
            nn.Conv2d(channel, channel, 3, 1, 1))

    def forward(self, x, flows_forward, flows_backward, mask):
        # x (b,t,c,h,w); flows (b,t-1,2,h,w); mask (b,t,2,h,w)
        b, t, c, h, w = x.shape
        feats = {"input": [x[:, i] for i in range(t)]}
        masks = {"input": [mask[:, i] for i in range(t)]}
        cache_list = ["input", "backward_1", "forward_1"]
        for p_i, module in enumerate(["backward_1", "forward_1"]):
            feats[module] = []
            if "backward" in module:
                frame_idx = list(range(t))[::-1]
                flow_idx = frame_idx
                flows_prop, flows_check = flows_forward, flows_backward
            else:
                frame_idx = list(range(t))
                flow_idx = list(range(-1, t - 1))
                flows_prop, flows_check = flows_backward, flows_forward
            feat_prop = None
            for i, idx in enumerate(frame_idx):
                feat_current = feats[cache_list[p_i]][idx]
                mask_current = masks["input"][idx]
                if i == 0:
                    feat_prop = feat_current
                else:
                    flow_prop = flows_prop[:, flow_idx[i]]
                    flow_check = flows_check[:, flow_idx[i]]
                    flow_valid = fb_consistency_check_t(flow_prop,
                                                        flow_check)
                    feat_warped = flow_warp_t(
                        feat_prop, flow_prop.permute(0, 2, 3, 1))
                    cond = torch.cat([feat_current, feat_warped, flow_prop,
                                      flow_valid, mask_current], dim=1)
                    feat_prop = self.deform_align[module](feat_prop, cond,
                                                          flow_prop)
                fe = torch.cat([feat_current, feat_prop, mask_current], 1)
                feat_prop = feat_prop + self.backbone[module](fe)
                feats[module].append(feat_prop)
            if "backward" in module:
                feats[module] = feats[module][::-1]
        outputs_b = torch.stack(feats["backward_1"], 1).view(-1, c, h, w)
        outputs_f = torch.stack(feats["forward_1"], 1).view(-1, c, h, w)
        outputs = self.fuse(torch.cat(
            [outputs_b, outputs_f, mask.view(-1, 2, h, w)], 1)) \
            + x.view(-1, c, h, w)
        return outputs.view(b, t, c, h, w)


class InpaintGenerator(nn.Module):
    def __init__(self, channel=128, hidden=512, depths=8):
        super().__init__()
        self.encoder = PPEncoder()
        self.decoder = nn.Sequential(
            deconv(channel, 128, 3, 1), nn.LeakyReLU(0.2, inplace=True),
            nn.Conv2d(128, 64, 3, 1, 1), nn.LeakyReLU(0.2, inplace=True),
            deconv(64, 64, 3, 1), nn.LeakyReLU(0.2, inplace=True),
            nn.Conv2d(64, 3, 3, 1, 1))
        self.ss = SoftSplit(channel, hidden)
        self.sc = SoftComp(channel, hidden)
        self.feat_prop_module = LearnablePropagation(channel)
        self.transformers = TemporalSparseTransformerBlock(depths, hidden)

    def forward(self, masked_frames, completed_flows, masks_in,
                masks_updated, num_local_frames, t_dilation=2):
        l_t = num_local_frames
        b, t, _, ori_h, ori_w = masked_frames.size()
        enc_feat = self.encoder(torch.cat([
            masked_frames.view(b * t, 3, ori_h, ori_w),
            masks_in.view(b * t, 1, ori_h, ori_w),
            masks_updated.view(b * t, 1, ori_h, ori_w)], dim=1))
        _, c, h, w = enc_feat.size()
        enc_feat = enc_feat.view(b, t, c, h, w)
        local_feat, ref_feat = enc_feat[:, :l_t], enc_feat[:, l_t:]
        ds_f = F.interpolate(completed_flows[0].view(-1, 2, ori_h, ori_w),
                             scale_factor=0.25, mode="bilinear",
                             align_corners=False).view(b, l_t - 1, 2, h,
                                                       w) / 4.0
        ds_b = F.interpolate(completed_flows[1].view(-1, 2, ori_h, ori_w),
                             scale_factor=0.25, mode="bilinear",
                             align_corners=False).view(b, l_t - 1, 2, h,
                                                       w) / 4.0
        ds_mask_in = F.interpolate(
            masks_in.reshape(-1, 1, ori_h, ori_w), scale_factor=0.25,
            mode="nearest").view(b, t, 1, h, w)
        ds_mask_upd_l = F.interpolate(
            masks_updated[:, :l_t].reshape(-1, 1, ori_h, ori_w),
            scale_factor=0.25, mode="nearest").view(b, l_t, 1, h, w)
        prop_mask = torch.cat([ds_mask_in[:, :l_t], ds_mask_upd_l], dim=2)
        local_feat = self.feat_prop_module(local_feat, ds_f, ds_b,
                                           prop_mask)
        enc_feat = torch.cat([local_feat, ref_feat], dim=1)
        trans = self.ss(enc_feat.view(-1, c, h, w), b, (h, w))[0]
        trans = self.transformers(trans, (h, w), t_dilation)
        trans = self.sc(trans[None], t, (h, w))
        trans = trans.view(b, t, -1, h, w)
        enc_feat = enc_feat + trans
        output = self.decoder(enc_feat[:, :l_t].reshape(-1, c, h, w))
        return torch.tanh(output).view(b, l_t, 3, ori_h, ori_w)
