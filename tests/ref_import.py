"""Import machinery for running /root/reference's PYTHON code on this box.

The reference tree needs CUDA pointnet2, torchvision, and timm; none exist
here.  `install_stubs()` pre-seeds sys.modules with namespace packages
pointing into /root/reference plus semantic-preserving stubs so individual
reference modules (models.model_3detr, criterion, utils.ap_calculator, ...)
import and RUN for live parity tests.  The CUDA _ext is replaced by CPU
implementations restating the kernels' exact semantics (sampling_gpu.cu:71-168
seed-0 FPS with the near-origin skip; ball_query_gpu.cu:12-48 first-hit-fill).

Usage:
    saved = install_stubs()
    try:
        mod = importlib.import_module("models.model_3detr")
        ...
    finally:
        restore(saved)
"""

import contextlib
import importlib
import os
import sys
import types

import numpy as np

REF = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REF, "models"))


@contextlib.contextmanager
def chdir(path):
    prev = os.getcwd()
    os.chdir(path)
    try:
        yield
    finally:
        os.chdir(prev)


# ---------------------------------------------------------------- _ext stubs
def _fps_stub(xyz, npoint):
    import torch

    from tests.golden import fps_golden

    inds = fps_golden(xyz.detach().cpu().numpy(), int(npoint))
    return torch.from_numpy(inds.astype(np.int32))


def _ball_query_stub(new_xyz, xyz, radius, nsample):
    """ball_query_gpu.cu:12-48 vectorized: first nsample hits in index order,
    trailing slots filled with the first hit, zeros when no hit."""
    import torch

    nx = new_xyz.detach().cpu().numpy()
    x = xyz.detach().cpu().numpy()
    d2 = ((nx[:, :, None, :] - x[:, None, :, :]) ** 2).sum(-1)  # (B, M, N)
    hit = d2 < radius * radius
    # stable argsort of (not hit): hits first, each group in index order
    order = np.argsort(~hit, axis=-1, kind="stable")[..., : int(nsample)]
    cnt = hit.sum(-1)  # (B, M)
    slot = np.arange(int(nsample))[None, None, :]
    first = order[..., :1]
    idx = np.where(slot < np.maximum(cnt[..., None], 1), order, first)
    idx = np.where(cnt[..., None] == 0, 0, idx)
    return torch.from_numpy(idx.astype(np.int32))


def _gather_points_stub(features, idx):
    import torch

    f = features.detach().cpu().numpy()  # (B, C, N)
    i = idx.detach().cpu().numpy().astype(np.int64)  # (B, M)
    out = np.take_along_axis(f, i[:, None, :].repeat(f.shape[1], 1), axis=2)
    return torch.from_numpy(out)


def _group_points_stub(features, idx):
    import torch

    f = features.detach().cpu().numpy()  # (B, C, N)
    i = idx.detach().cpu().numpy().astype(np.int64)  # (B, M, K)
    b, c, _ = f.shape
    m, k = i.shape[1], i.shape[2]
    flat = i.reshape(b, 1, m * k).repeat(c, 1)
    out = np.take_along_axis(f, flat, axis=2).reshape(b, c, m, k)
    return torch.from_numpy(out)


def _sigmoid_focal_loss_stub(inputs, targets, alpha=0.25, gamma=2, reduction="none"):
    """torchvision.ops.sigmoid_focal_loss semantics (used by the reference's
    loss_sem_cls / loss_image_seen_class)."""
    import torch
    import torch.nn.functional as F

    p = torch.sigmoid(inputs)
    ce = F.binary_cross_entropy_with_logits(inputs, targets, reduction="none")
    p_t = p * targets + (1 - p) * (1 - targets)
    loss = ce * ((1 - p_t) ** gamma)
    if alpha >= 0:
        loss = (alpha * targets + (1 - alpha) * (1 - targets)) * loss
    if reduction == "mean":
        return loss.mean()
    if reduction == "sum":
        return loss.sum()
    return loss


def install_stubs():
    """Pre-seed sys.modules so /root/reference's modules import cleanly on a
    CPU-only box without torchvision/timm/CUDA-_ext. Returns the saved module
    table for restore()."""
    saved = dict(sys.modules)

    def ns_pkg(name, path):
        m = types.ModuleType(name)
        m.__path__ = [path]
        sys.modules[name] = m

    ns_pkg("models", os.path.join(REF, "models"))
    ns_pkg("utils", os.path.join(REF, "utils"))
    ns_pkg("datasets", os.path.join(REF, "datasets"))
    ns_pkg("CLIP", os.path.join(REF, "CLIP"))
    ns_pkg("third_party_pointnet2", os.path.join(REF, "third_party_pointnet2"))

    # the CUDA extension: golden-semantics CPU stubs
    ext = types.ModuleType("pointnet2._ext")
    ext.furthest_point_sampling = _fps_stub
    ext.ball_query = _ball_query_stub
    ext.gather_points = _gather_points_stub
    ext.group_points = _group_points_stub
    pn2 = types.ModuleType("pointnet2")
    pn2._ext = ext
    sys.modules["pointnet2"] = pn2
    sys.modules["pointnet2._ext"] = ext
    # pointnet2_utils does a bare `import pytorch_utils`
    sys.path.insert(0, os.path.join(REF, "third_party_pointnet2", "pointnet2"))
    # reference-root modules (criterion.py, optimizer.py, engine.py)
    sys.path.insert(0, REF)

    # torchvision stubs.  Names touched only at import stay inert (_NoOp);
    # the transforms + ops.nms that the stage-2 discovery path CALLS
    # (model_3detr.py:1297-1541, CLIP/clip/clip.py:95-101) get functional
    # implementations with torchvision's tensor-backend semantics
    # (Resize == F.interpolate(mode, antialias=True), the contract our
    # device crop path models -- models/distillation.py).
    import torch
    import torch.nn.functional as _F

    tv = types.ModuleType("torchvision")
    tvt = types.ModuleType("torchvision.transforms")

    class _NoOp:
        def __init__(self, *a, **k):
            pass

        def __call__(self, x):
            raise NotImplementedError("torchvision stub")

    class _Interp:
        BICUBIC = "bicubic"
        BILINEAR = "bilinear"

    class _Resize:
        """torchvision.transforms.Resize on tensors: int size == smaller edge
        -> size (aspect preserved), antialias semantics of the tensor
        backend."""

        def __init__(self, size, interpolation="bicubic", **kw):
            self.size = size
            self.mode = getattr(interpolation, "value", interpolation)

        def __call__(self, x):
            batched = x.dim() == 4
            if not batched:
                x = x.unsqueeze(0)
            h, w = x.shape[-2:]
            if isinstance(self.size, int):
                if h <= w:
                    out = (self.size, max(1, int(round(w * self.size / h))))
                else:
                    out = (max(1, int(round(h * self.size / w))), self.size)
            else:
                out = tuple(self.size)
            y = _F.interpolate(x.float(), size=out, mode=self.mode,
                               antialias=True).to(x.dtype)
            return y if batched else y.squeeze(0)

    class _CenterCrop:
        def __init__(self, size, **kw):
            self.size = (size, size) if isinstance(size, int) else tuple(size)

        def __call__(self, x):
            th, tw = self.size
            h, w = x.shape[-2:]
            i, j = max(0, (h - th) // 2), max(0, (w - tw) // 2)
            return x[..., i:i + th, j:j + tw]

    class _Normalize:
        def __init__(self, mean, std, **kw):
            self.mean, self.std = mean, std

        def __call__(self, x):
            mean = torch.as_tensor(self.mean, dtype=x.dtype).view(-1, 1, 1)
            std = torch.as_tensor(self.std, dtype=x.dtype).view(-1, 1, 1)
            return (x - mean) / std

    class _Compose:
        def __init__(self, transforms):
            self.transforms = transforms

        def __call__(self, x):
            for t in self.transforms:
                x = t(x)
            return x

    def _nms_stub(boxes, scores, iou_threshold):
        """torchvision.ops.nms: greedy, score-descending, suppress IoU >
        threshold, returns kept indices (int64)."""
        b = boxes.detach().cpu().numpy().astype(np.float64)
        s = scores.detach().cpu().numpy().astype(np.float64)
        order = np.argsort(-s, kind="stable")
        areas = np.maximum(0.0, b[:, 2] - b[:, 0]) * np.maximum(0.0, b[:, 3] - b[:, 1])
        keep = []
        while order.size:
            i = order[0]
            keep.append(int(i))
            rest = order[1:]
            xx1 = np.maximum(b[i, 0], b[rest, 0])
            yy1 = np.maximum(b[i, 1], b[rest, 1])
            xx2 = np.minimum(b[i, 2], b[rest, 2])
            yy2 = np.minimum(b[i, 3], b[rest, 3])
            inter = np.maximum(0.0, xx2 - xx1) * np.maximum(0.0, yy2 - yy1)
            iou = inter / np.maximum(areas[i] + areas[rest] - inter, 1e-12)
            order = rest[iou <= iou_threshold]
        return torch.as_tensor(keep, dtype=torch.int64, device=boxes.device)

    tvt.Resize = _Resize
    tvt.Compose = _Compose
    tvt.CenterCrop = _CenterCrop
    tvt.ToTensor = _NoOp  # PIL-only entry point; unused on tensor inputs
    tvt.Normalize = _Normalize
    tvt.InterpolationMode = _Interp
    tv.transforms = tvt
    tvo = types.ModuleType("torchvision.ops")
    tvo.nms = _nms_stub
    tvo.sigmoid_focal_loss = _sigmoid_focal_loss_stub
    tv.ops = tvo
    tvm = types.ModuleType("torchvision.models")
    tvmd = types.ModuleType("torchvision.models.detection")
    tvmb = types.ModuleType("torchvision.models.detection.backbone_utils")
    tvmb.resnet_fpn_backbone = _NoOp
    tvmd.backbone_utils = tvmb
    tvm.detection = tvmd
    tv.models = tvm
    for k, v in [
        ("torchvision", tv), ("torchvision.transforms", tvt),
        ("torchvision.ops", tvo), ("torchvision.models", tvm),
        ("torchvision.models.detection", tvmd),
        ("torchvision.models.detection.backbone_utils", tvmb),
    ]:
        sys.modules[k] = v

    # timm constants (vendored vision_transformer + model_3detr import these)
    timm = types.ModuleType("timm")
    td = types.ModuleType("timm.data")
    tdc = types.ModuleType("timm.data.constants")
    for mod in (td, tdc):
        mod.IMAGENET_DEFAULT_MEAN = (0.485, 0.456, 0.406)
        mod.IMAGENET_DEFAULT_STD = (0.229, 0.224, 0.225)
        mod.IMAGENET_INCEPTION_MEAN = (0.5, 0.5, 0.5)
        mod.IMAGENET_INCEPTION_STD = (0.5, 0.5, 0.5)
        mod.OPENAI_CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
        mod.OPENAI_CLIP_STD = (0.26862954, 0.26130258, 0.27577711)
        mod.DEFAULT_CROP_PCT = 0.875
    timm.data = td
    timm.__version__ = "0.0.0"
    sys.modules["timm"] = timm
    sys.modules["timm.data"] = td
    sys.modules["timm.data.constants"] = tdc

    # CLIP/clip/clip.py: `from pkg_resources import packaging`
    if "pkg_resources" not in sys.modules:
        try:
            import pkg_resources  # noqa: F401
        except ImportError:
            pr = types.ModuleType("pkg_resources")
            pr.packaging = importlib.import_module("packaging")
            pr.packaging.version = importlib.import_module("packaging.version")
            sys.modules["pkg_resources"] = pr

    # CLIP BPE tokenizer text-normalization dep (never invoked here)
    if "ftfy" not in sys.modules:
        try:
            import ftfy  # noqa: F401
        except ImportError:
            ftfy = types.ModuleType("ftfy")
            ftfy.fix_text = lambda s: s
            sys.modules["ftfy"] = ftfy

    # utils.pc_util / votenet_pc_util IO deps
    for name in ("plyfile", "trimesh"):
        if name not in sys.modules:
            stub = types.ModuleType(name)
            stub.PlyData = stub.PlyElement = object
            sys.modules[name] = stub

    # the reference hardcodes .to('cuda') in a few ctors (criterion.py:97);
    # redirect to CPU while the stubs are installed
    import torch

    if not hasattr(torch.Tensor, "_coda_orig_to"):
        orig_to = torch.Tensor.to

        def _to_cpu_redirect(self, *args, **kwargs):
            args = tuple("cpu" if a == "cuda" else a for a in args)
            if kwargs.get("device") == "cuda":
                kwargs["device"] = "cpu"
            return orig_to(self, *args, **kwargs)

        torch.Tensor._coda_orig_to = orig_to
        torch.Tensor.to = _to_cpu_redirect
    return saved


def restore(saved):
    import torch

    if hasattr(torch.Tensor, "_coda_orig_to"):
        torch.Tensor.to = torch.Tensor._coda_orig_to
        del torch.Tensor._coda_orig_to
    for k in list(sys.modules):
        if k not in saved:
            del sys.modules[k]
        elif sys.modules[k] is not saved[k]:
            sys.modules[k] = saved[k]
    for p in (os.path.join(REF, "third_party_pointnet2", "pointnet2"), REF):
        while p in sys.path:
            sys.path.remove(p)
