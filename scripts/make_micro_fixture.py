"""Generate tests/fixtures/micro_bottleneck.pth + golden outputs.

VERDICT round-2 item 8: commit a micro-fixture of REAL torch-serialized
weights (torch.save zip/pickle format, exactly what torchvision checkpoints
and the reference's ``torch.save(state_dict)`` produce — ref
AlternatingDirectionCutLoss.py:483-487) so the ``.pth`` ingestion path
(models/torch_import.load_pth → torch_to_flax) is exercised against a real
file in every test run, not just in-memory mirror state dicts.

The fixture is one Bottleneck block (torchvision key layout ``layer1.0.*``,
with downsample) plus its eval-mode forward on a fixed input. ~80 KB.
Deterministic: re-running reproduces the same tensors (seeded), though the
zip byte stream may differ across torch versions — only the loaded values
matter.
"""

import os
import sys

import numpy as np
import torch

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tests"))
from torch_ref import TBottleneck, randomize_bn_stats  # noqa: E402


def main():
    out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                           "tests", "fixtures")
    os.makedirs(out_dir, exist_ok=True)

    torch.manual_seed(42)
    downsample = torch.nn.Sequential(
        torch.nn.Conv2d(16, 32, 1, 1, bias=False), torch.nn.BatchNorm2d(32))
    block = TBottleneck(16, 8, stride=1, dilation=1, downsample=downsample)
    randomize_bn_stats(block, 42)
    block.eval()

    # torchvision-style prefix so the layerX_Y rewrite path is exercised too
    state = {f"layer1.0.{k}": v for k, v in block.state_dict().items()}
    torch.save(state, os.path.join(out_dir, "micro_bottleneck.pth"))

    rng = np.random.default_rng(42)
    x = rng.standard_normal((2, 12, 12, 16), dtype=np.float32)
    with torch.no_grad():
        y = block(torch.from_numpy(x).permute(0, 3, 1, 2))
    np.savez(
        os.path.join(out_dir, "micro_bottleneck_golden.npz"),
        x=x, y=y.permute(0, 2, 3, 1).numpy(),
    )
    print("wrote", sorted(os.listdir(out_dir)))


if __name__ == "__main__":
    main()
