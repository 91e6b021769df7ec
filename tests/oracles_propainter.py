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
