"""PyTorch baseline for bench.py: the reference's compute stack.

A faithful re-expression of the reference hot path (torch.sparse.mm
Chebyshev recurrence + dense GEMM UNet with hierarchical HEALPix pooling,
reference: modules/layers.py:113-180, modules/my_models_graph.py:220-564)
written against this framework's own geometry, used ONLY to anchor
bench.py's vs_baseline on hardware available in this environment (CPU —
no NVIDIA GPU present; uses CUDA automatically if torch sees one).
"""

from __future__ import annotations

import time

import numpy as np


def measure_torch_baseline(repeats: int = 3, subdiv: int = 16, batch: int = 16,
                           ar_iters: int = 6, knn: int = 20) -> float:
    import torch

    from deepsphere_weather_tpu.sphere import build_graph

    device = "cuda" if torch.cuda.is_available() else "cpu"
    n_node = 12 * subdiv ** 2

    # Laplacians for the 3-level pyramid
    laps = []
    for s in (subdiv, subdiv // 2, subdiv // 4):
        g = build_graph("healpix", {"subdivisions": s, "nest": True}, k=knn)
        coo = g.L.tocoo()
        idx = torch.from_numpy(np.stack([coo.row, coo.col]).astype(np.int64))
        lap = torch.sparse_coo_tensor(idx, torch.from_numpy(coo.data),
                                      coo.shape).coalesce().to(device)
        laps.append(lap)

    K = 3

    def conv_cheb(lap, x, weight):
        B, V, Fin = x.shape
        x0 = x.permute(1, 2, 0).reshape(V, Fin * B)
        xs = [x0, torch.sparse.mm(lap, x0)]
        xs.append(2 * torch.sparse.mm(lap, xs[1]) - xs[0])
        xk = torch.stack(xs, 0).reshape(K, V, Fin, B)
        xk = xk.permute(3, 1, 2, 0).reshape(B * V, Fin * K)
        return (xk @ weight.reshape(Fin * K, -1)).reshape(B, V, -1)

    class ConvBlock(torch.nn.Module):
        def __init__(self, fin, fout, lap, act=True):
            super().__init__()
            self.w = torch.nn.Parameter(
                torch.randn(fin, K, fout) * (2.0 / (fin * K)) ** 0.5)
            self.b = torch.nn.Parameter(torch.zeros(fout))
            self.lap, self.act = lap, act

        def forward(self, x):
            x = conv_cheb(self.lap, x, self.w) + self.b
            return torch.relu(x) if self.act else x

    class ResBlock(torch.nn.Module):
        def __init__(self, fin, fouts, lap):
            super().__init__()
            self.c1 = ConvBlock(fin, fouts[0], lap)
            self.c2 = ConvBlock(fouts[0], fouts[1], lap, act=False)
            self.rz = torch.nn.Parameter(torch.zeros(1))
            self.proj = (torch.nn.Linear(fin, fouts[1])
                         if fin != fouts[1] else torch.nn.Identity())

        def forward(self, x):
            return self.c2(self.c1(x)) * self.rz + self.proj(x)

    def pool(x):
        B, V, C = x.shape
        return x.reshape(B, V // 4, 4, C).amax(dim=2)

    def unpool(x):
        return x.repeat_interleave(4, dim=1)

    class UNet(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = ResBlock(7 * 3, (64, 128), laps[0])
            self.conv2 = ResBlock(128, (192, 256), laps[1])
            self.conv3 = ResBlock(256, (512, 256), laps[2])
            self.uconv2 = ResBlock(512, (256, 128), laps[1])
            self.uconv1 = ResBlock(256, (128, 64), laps[0])
            self.ufinal = ResBlock(64, (64, 2), laps[0])

        def forward(self, x):                       # x: [B, V, 21]
            e1 = self.conv1(x)
            e2 = self.conv2(pool(e1))
            e3 = self.conv3(pool(e2))
            d2 = self.uconv2(torch.cat([unpool(e3), e2], dim=2))
            d1 = self.uconv1(torch.cat([unpool(d2), e1], dim=2))
            return self.ufinal(d1)

    model = UNet().to(device)
    opt = torch.optim.Adam(model.parameters(), lr=1e-3, eps=1e-7)
    x = torch.randn(batch, n_node, 21, device=device)
    y = torch.randn(batch, n_node, 2, device=device)

    def step():
        opt.zero_grad()
        total = 0.0
        inp = x
        for _ in range(ar_iters + 1):
            out = model(inp)
            total = total + torch.mean((out - y) ** 2)
            # feed prediction back (stack_most_recent_prediction analogue)
            inp = torch.cat([inp[:, :, :-2], out], dim=2)
        total.backward()
        opt.step()
        if device == "cuda":
            torch.cuda.synchronize()

    step()  # warmup
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        step()
        times.append(time.perf_counter() - t0)
    med = sorted(times)[len(times) // 2]
    return batch / med


if __name__ == "__main__":
    print(measure_torch_baseline())
