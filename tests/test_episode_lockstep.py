"""Episode-composition lockstep vs the reference MQ CL driver.

Every building block is already pinned against the reference (train step
trajectories, each CL-method update, the full inference chain, metrics) —
this test drives the COMPOSITION: the reference's actual per-task loop
body (MQ/train_cl.py:206-389) over a tiny 2-task x 3-epoch episode built
from synthetic on-disk data, through the reference's own QILSetTask,
Ego4dCLDataset (.pt feature files), DataLoader, train_one_epoch,
valid_one_epoch_cl_single_gpu, add_samples_to_mem, load_best_checkpoint,
final_validate, augment_classification and (ewc) on_task_update — then
runs our EpisodeRunner on the same split pkl and pins:

  1. post-episode params leaf-by-leaf (through the torch importer);
  2. the rehearsal-memory contents (exact video-id sets per class — the
     quota keeps every video, so the reference's random.shuffle order
     cannot differ the SET; order itself is RNG-stack-specific);
  3. the grown-head state after augment_classification (old rows copied,
     new bias rows at the prior constant, Gaussians re-init — the fresh
     random conv rows are synced torch->ours, as two RNG stacks cannot
     produce equal draws);
  4. the per-epoch eval series, best-epoch index, and the BwF numbers
     from final_validate.

Design notes making the lockstep well-posed:
  - ONE optimizer-step batch per epoch on both sides (batch = all task
    videos; gradients sum over the batch, so DataLoader-vs-BatchIterator
    shuffle order cannot matter); the two tasks hence share
    steps-per-epoch, sidestepping the reference's stale
    num_iters_per_epoch quirk (train_cl.py:389 reuses task 0's value —
    documented in PARITY.md).
  - memory quota m = memory_size // n_classes >= videos-per-class, so
    trimming keeps everything and contents pin exactly.
  - all clips are exactly max_seq_len with crop_ratio=None, so
    truncate_feats is a no-op on both sides.
"""

from __future__ import annotations

import os
import pickle

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from tests._mq_fixture import (
    ARCH,
    CIN,
    CLIP,
    CTXT,
    E,
    H,
    INIT_NORM,
    LR,
    RR,
    WD,
    write_xlnet_config,
)
from tests._reference import load_reference_mq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

T = 64            # feature grid == max_seq_len (no truncation ambiguity)
LTXT = 12
NC0, NC1 = 4, 3   # task 0 / task 1 class counts
NC = NC0 + NC1
PER_CLASS_TRAIN = 2
PER_CLASS_VAL = 1
MEM_SIZE = 20     # m = 20 // 4 = 5 >= 2 -> memory keeps every video
EPOCHS, WARM_EP = 2, 1          # reference max_epochs = 3
SEED = 7

# ids 0..6 of the reference's hardcoded 110-class Ego4D-MQ dict
# (MQ/libs/datasets/ego4d.py classes_dict == the copies embedded in
# valid_one_epoch_cl_single_gpu / final_validate) — the synthetic split
# must use these names so the reference's prediction-side idx_classes
# lookup meets the same names as the pkl GT
CLASS_NAMES = {
    0: "take_photo_/_record_video_with_a_camera",
    1: "hang_clothes_in_closet_/_on_hangers",
    2: "browse_through_clothing_items_on_rack_/_shelf_/_hanger",
    3: "withdraw_money_from_atm_/_operate_atm",
    4: "stir_/_mix_ingredients_in_a_bowl_or_pan_(before_cooking)",
    5: "wash_hands",
    6: "clean_/_wipe_other_surface_or_object",
}


@pytest.fixture(scope="module")
def ref_nms_ext():
    """The reference's real C++ NMS op (same cached build as
    test_inference_lockstep)."""
    from torch.utils import cpp_extension

    src = "/root/reference/MQ/libs/utils/csrc/nms_cpu.cpp"
    if not os.path.exists(src):
        pytest.skip("reference checkout not available")
    build_dir = os.path.join(REPO, ".cache", "ref_nms_ext")
    os.makedirs(build_dir, exist_ok=True)
    return cpp_extension.load(
        name="nms_1d_cpu_ref", sources=[src],
        extra_cflags=["-O2", "-fopenmp"], extra_ldflags=["-fopenmp"],
        build_directory=build_dir, verbose=False)


# ---------------------------------------------------------------------------
# synthetic split + on-disk reference-format data


def _make_videos(rng, task_classes, n_per_class, split, feats_store,
                 text_store):
    """Video dicts in the split-pkl schema + per-video feature arrays."""
    dict_db = []
    for c in task_classes:
        for n in range(n_per_class):
            vid = f"{split}_c{c}_v{n}"
            n_seg = 2 if (n + c) % 2 == 0 else 3
            s = rng.uniform(2, T - 16, size=n_seg).astype(np.float32)
            e = s + rng.uniform(3, 12, size=n_seg).astype(np.float32)
            segs = np.stack([s, e], 1)
            dict_db.append({
                "id": vid,
                "parent_video_id": "pv_" + vid,
                "fps": 1.0,
                "duration": float(T),
                "segments": segs,
                "labels": np.full((n_seg,), c, np.int64),
                "segmentation_labels": torch.zeros(T, NC),
            })
            feats_store[vid] = rng.standard_normal(
                (T, CIN)).astype(np.float32)
            text_store[vid] = rng.standard_normal(
                (LTXT, CTXT)).astype(np.float32)
    return dict_db


def _build_split(tmp_path):
    rng = np.random.default_rng(SEED)
    feats_store, text_store = {}, {}
    tasks = {0: list(range(NC0)), 1: list(range(NC0, NC))}
    split = {"train": {}, "val": {}}
    for j, classes in tasks.items():
        label_dict = {CLASS_NAMES[c]: c for c in classes}
        split["train"][j] = {
            "label_dict": dict(label_dict),
            "dict_db": _make_videos(rng, classes, PER_CLASS_TRAIN,
                                    f"tr{j}", feats_store, text_store),
        }
        split["val"][j] = {
            "label_dict": dict(label_dict),
            "dict_db": _make_videos(rng, classes, PER_CLASS_VAL,
                                    f"va{j}", feats_store, text_store),
        }

    # on-disk layout the reference stack reads
    feat_dir = tmp_path / "feats"
    text_dir = tmp_path / "text"
    feat_dir.mkdir()
    text_dir.mkdir()
    for vid, arr in feats_store.items():
        torch.save(torch.from_numpy(arr), feat_dir / f"{vid}.pt")
    for j, classes in tasks.items():
        pass
    for task in list(split["train"].values()) + list(split["val"].values()):
        for v in task["dict_db"]:
            vid = v["id"]
            c = int(np.asarray(v["labels"]).reshape(-1)[0])
            torch.save({CLASS_NAMES[c]: torch.from_numpy(text_store[vid])},
                       text_dir / f"{vid}.pt")

    # the GT pkl at the reference's HARDCODED relative path (CWD-relative;
    # the test chdir's into tmp_path)
    gt_dir = tmp_path / "data" / "ego4d"
    gt_dir.mkdir(parents=True)
    pkl_path = gt_dir / "ego4d_mq_query_incremental_22_all.pkl"
    with open(pkl_path, "wb") as f:
        pickle.dump(split, f)
    (tmp_path / "empty.json").write_text("{}")
    return split, feats_store, text_store, str(feat_dir), str(text_dir)


# ---------------------------------------------------------------------------
# reference episode driver (transcription of MQ/train_cl.py:206-389)


def _ref_dataset_cfg(feat_dir, text_dir, json_file):
    return dict(
        feat_folder=feat_dir, json_file=json_file, feat_stride=1,
        num_frames=0, default_fps=1.0, downsample_rate=1, max_seq_len=T,
        trunc_thresh=0.5, crop_ratio=None, input_dim=CIN, num_classes=NC0,
        file_prefix="", file_ext=".pt", force_upsampling=False,
        use_text=True, text_feat_folder=text_dir, max_text_len=LTXT,
        output_format="concat", use_narration=False,
        narration_feat_folder="")


def _ref_model(ref, tmp_path, num_classes, cl_overrides):
    from tests._mq_fixture import ref_cfg_dicts

    write_xlnet_config(tmp_path)
    train_cfg, test_cfg, cl_cfg = ref_cfg_dicts(cl_overrides)
    test_cfg.update(pre_nms_topk=200, max_seg_num=40, min_score=0.0001,
                    nms_sigma=0.99, duration_thresh=0.01, iou_threshold=0.1,
                    multiclass_nms=True)
    tmodel = ref.modeling.meta_archs.PtTransformer(
        backbone_type="convTransformer", fpn_type="identity", use_xl=True,
        backbone_arch=ARCH, scale_factor=2, input_dim=CIN, max_seq_len=T,
        max_buffer_len_factor=1.0, n_head=H, n_mha_win_size=-1,
        embd_kernel_size=3, embd_dim=E, embd_with_ln=True, fpn_dim=E,
        fpn_with_ln=True, fpn_start_level=0, head_dim=E,
        regression_range=RR, head_num_layers=3, head_kernel_size=3,
        head_with_ln=True, use_abs_pe=True, use_rel_pe=False,
        num_classes=num_classes, train_cfg=train_cfg, test_cfg=test_cfg,
        cl_cfg=cl_cfg, use_cross_modal=True, n_txt_in=CTXT)
    gen = torch.Generator().manual_seed(12345)
    with torch.no_grad():
        for p in tmodel.parameters():
            p.normal_(0.0, 0.15, generator=gen)
        for name, p in tmodel.named_parameters():
            if "sigma" in name:
                p.abs_().add_(0.5)
    tmodel.train()
    return tmodel, test_cfg


class _Logger:
    def info(self, *a, **k):
        pass


def _run_reference_episode(ref, ref_nms_ext, tmp_path, method, feat_dir,
                           text_dir, split, monkeypatch):
    """MQ/train_cl.py:95-389 transcription (CPU-safe: the only edits are
    map_location/cuda removal in load_best_checkpoint and dropping the
    logging/tensorboard plumbing)."""
    monkeypatch.chdir(tmp_path)
    monkeypatch.setenv("LOCAL_RANK", "0")
    monkeypatch.setattr(ref.utils.nms, "nms_1d_cpu", ref_nms_ext)

    # pandas-version shim: ANETdetection.evaluate does
    # preds['label'].replace(self.activity_index) where activity_index is
    # a LIST of dicts under use_cl (metrics.py:251). pandas 1.x (the
    # reference's era) treats a list of non-matching elements as a no-op
    # pad-replace; pandas 2 raises. Restore the legacy no-op.
    import pandas as pd

    orig_replace = pd.Series.replace

    def legacy_replace(self, to_replace=None, *a, **k):
        if (isinstance(to_replace, list) and to_replace
                and isinstance(to_replace[0], dict)):
            return self.copy()
        return orig_replace(self, to_replace, *a, **k)

    monkeypatch.setattr(pd.Series, "replace", legacy_replace)
    # numpy>=1.24 removed the np.float alias the reference's AP code uses
    # (metrics.py:213 via compute_average_precision_detection)
    if not hasattr(np, "float"):
        monkeypatch.setattr(np, "float", np.float64, raising=False)
    if not hasattr(np, "int"):
        monkeypatch.setattr(np, "int", np.int64, raising=False)

    cl_overrides = dict(memory_size=MEM_SIZE)
    if method == "ewc":
        cl_overrides.update(name="ewc", reg_lambda=2.0)
    tmodel, test_cfg = _ref_model(ref, tmp_path, NC0, cl_overrides)

    qil_cfg = {
        "init_rand_seed": SEED,
        "dataset_name": "ego4d_cl",
        "train_split": ("train",),
        "val_split": ("val",),
        "dataset": _ref_dataset_cfg(feat_dir, text_dir,
                                    str(tmp_path / "empty.json")),
        "loader": {"batch_size": NC0 * PER_CLASS_TRAIN, "num_workers": 0},
        "opt": {"learning_rate": LR, "weight_decay": WD, "epochs": EPOCHS,
                "warmup": True, "warmup_epochs": WARM_EP,
                "schedule_type": "cosine", "type": "AdamW",
                "momentum": 0.9, "eta_min": 1e-8},
    }
    if not torch.distributed.is_initialized():
        torch.distributed.init_process_group(
            "gloo", init_method="tcp://127.0.0.1:29811", world_size=1,
            rank=0)

    QILSetTask = ref.datasets.cl_benchmark.QILSetTask
    train_qil = QILSetTask(qil_cfg, pickle.loads(pickle.dumps(
        split["train"])), MEM_SIZE, shuffle=True, train_enable=True)
    val_qil = QILSetTask(qil_cfg, pickle.loads(pickle.dumps(
        split["val"])), MEM_SIZE, shuffle=False, train_enable=False)

    tiou = np.array([0.1, 0.2, 0.3, 0.4, 0.5])
    evaluator = ref.utils.metrics.ANETdetection(
        "data/ego4d/ego4d_mq_query_incremental_22_all.pkl", "val",
        tiou_thresholds=tiou, use_cl=True)
    # joblib's loky workers don't see the np.float monkeypatch above —
    # run the per-class AP jobs in-process (identical math)
    evaluator.num_workers = 1

    make_optimizer = ref.utils.train_utils.make_optimizer
    make_scheduler = ref.utils.train_utils.make_scheduler
    train_one_epoch = ref.utils.train_utils.train_one_epoch
    valid_one_epoch = ref.utils.train_utils.valid_one_epoch_cl_single_gpu
    final_validate = ref.utils.train_utils.final_validate
    on_task_update = ref.cl_methods.EWC.on_task_update

    optimizer = make_optimizer(tmodel, qil_cfg["opt"])
    iter_train = iter(train_qil)
    num_tasks = train_qil.num_tasks
    data, train_loader_i, num_next_classes = next(iter_train)
    num_iters_per_epoch = len(train_loader_i)
    scheduler = make_scheduler(optimizer, qil_cfg["opt"],
                               num_iters_per_epoch)

    max_epochs = EPOCHS + WARM_EP
    logger = _Logger()
    ckpt_folder = str(tmp_path / "ref_ckpt")
    os.makedirs(ckpt_folder, exist_ok=True)
    record = {"eval": {}, "best_epoch": {}, "final": {}, "memory": {},
              "aug_state": None, "reg_params": None, "n_iters": []}
    list_val_recall_ii = {"val": []}
    list_val_mAP_ii = {"val": []}

    for j in range(num_tasks):
        if j != 0:
            qil_cfg["loader"]["batch_size"] = (
                NC1 * PER_CLASS_TRAIN + NC0 * PER_CLASS_TRAIN)
            data, train_loader_i, num_next_classes = next(iter_train)
        record["n_iters"].append(len(train_loader_i))

        # pre-task eval (train_cl.py:209-219) — state-free, skipped

        prev_out_cls_logits_dict = {}
        if tmodel.type_sampling == "icarl":
            # :226-235 (built for every method; consumed only by icarl)
            for video_list in train_loader_i:
                out_cls_logits, _, _ = tmodel(
                    video_list, task_id=j, get_emb=True)
                for i in range(len(video_list)):
                    vid = video_list[i]["video_id"]
                    prev_out_cls_logits_dict[vid] = [
                        np.array(torch.sigmoid(
                            out_cls_logits[k][i]).cpu().detach().numpy())
                        for k in range(len(out_cls_logits))]

        best_avgmap, best_epoch = -10000.0, -1
        for epoch in range(max_epochs):
            train_loader_i.sampler.set_epoch(epoch)
            # record the DataLoader's video order for this (task, epoch):
            # our BatchIterator replays it so the batch ROW order matches
            # (summation order inside one batch is float-visible; Adam's
            # sign-like first steps amplify ~1e-7 reduction noise to
            # ~1e-3 param drift — same sync as the shared random init)
            ids = []
            for vl in train_loader_i:
                ids.extend(v["video_id"] for v in vl)
            record.setdefault("order", {})[(j, epoch)] = ids
            train_one_epoch(
                train_loader_i, tmodel, optimizer, scheduler, epoch, 1,
                model_ema=None, clip_grad_l2norm=CLIP, tb_writer=None,
                print_freq=1000, logger=logger,
                cl_name=(method if method != "naive" else None),
                reg_lambda=cl_overrides.get("reg_lambda", 0.0),
                prev_out_cls_logits_dict=prev_out_cls_logits_dict,
                current_task_id=j)
            if os.environ.get("EPDBG"):
                print(f"[ref] task {j} epoch {epoch} post-train "
                      f"norm={tmodel.loss_normalizer}")
            if epoch < max_epochs // 3:
                continue
            with torch.no_grad():
                r13, r53, r15, r55, total_mAP = valid_one_epoch(
                    val_qil, tmodel, epoch, j, evaluator=evaluator,
                    tb_writer=None, logger=logger, print_freq=1000)
            record["eval"][(j, epoch)] = dict(
                R1_03=float(r13), R1_05=float(r15), mAP=float(total_mAP))
            if total_mAP > best_avgmap:
                best_avgmap, best_epoch = total_mAP, epoch
                torch.save(
                    {"task": j, "epoch": epoch,
                     "state_dict": tmodel.state_dict(),
                     "reg_params": tmodel.reg_params},
                    os.path.join(ckpt_folder,
                                 f"best_task_{j:03d}_performance.pth.tar"))
        record["best_epoch"][j] = best_epoch

        # memory (train_cl.py:343-361)
        m = MEM_SIZE // tmodel.cls_head.cls_head.conv.out_channels
        tmodel.add_samples_to_mem(val_qil, data, m)
        train_qil.memory = tmodel.memory
        tmodel.n_known = len(tmodel.memory)
        record["memory"][j] = {
            c: sorted(v["id"] for v in vids)
            for c, vids in tmodel.memory.items()}

        # load best + final_validate (:363-371)
        ck = torch.load(os.path.join(
            ckpt_folder, f"best_task_{j:03d}_performance.pth.tar"),
            map_location="cpu")
        tmodel.load_state_dict(ck["state_dict"])
        tmodel.reg_params = ck["reg_params"]
        record.setdefault("task_params", {})[j] = {
            k: v.detach().cpu().numpy().copy()
            for k, v in tmodel.state_dict().items()}
        with torch.no_grad():
            fr13, fr53, fr15, fr55, fmap, bwf_r15, bwf_map = final_validate(
                val_qil, tmodel, max_epochs - 1, j, evaluator=evaluator,
                tb_writer=None, logger=logger, print_freq=1000,
                list_val_recall_ii=list_val_recall_ii,
                list_val_mAP_ii=list_val_mAP_ii, type_val="val")
        # AverageMeter.avg is None before any update: at task 0 no
        # earlier task exists, so the reference's BWF meters stay empty
        record["final"][j] = dict(
            R1_05=float(fr15), mAP=float(fmap),
            BWF_R1_05=float(bwf_r15 if bwf_r15 is not None else 0.0),
            BWF_mAP=float(bwf_map if bwf_map is not None else 0.0))
        # the loss-normalizer EMA is the sharpest composition probe: its
        # value counts every is_training forward the loop ever ran (and
        # survives best-checkpoint reloads — it is not state_dict
        # content), so any extra/missing epoch, estimation pass or
        # snapshot-with-losses shifts it
        record.setdefault("loss_norm", {})[j] = float(
            tmodel.loss_normalizer)
        if os.environ.get("EPDBG"):
            print(f"[ref] task {j} end norm={tmodel.loss_normalizer}")

        if num_next_classes is not None:
            tmodel.augment_classification(num_next_classes, "cpu")
            record["aug_state"] = {
                "cls_w": tmodel.cls_head.cls_head.conv.weight.data
                .clone().numpy(),
                "cls_b": tmodel.cls_head.cls_head.conv.bias.data
                .clone().numpy(),
                "mu": tmodel.mu.data.clone().numpy(),
                "sigma": tmodel.sigma.data.clone().numpy(),
            }
            if method == "ewc":
                tmodel.reg_params = on_task_update(
                    train_loader_i, "cpu", optimizer, tmodel)
                record["reg_params"] = tmodel.reg_params
                record["loss_norm_post_est"] = float(
                    tmodel.loss_normalizer)
            optimizer = make_optimizer(tmodel, qil_cfg["opt"])
            scheduler = make_scheduler(optimizer, qil_cfg["opt"],
                                       num_iters_per_epoch)

    record["model"] = tmodel
    return record


# ---------------------------------------------------------------------------
# our side


def _our_config(method):
    from vilco_tpu.core.config import Config

    cl = {"name": method, "memory_size": MEM_SIZE,
          "path_memory": "mem.pkl"}
    if method == "ewc":
        cl["reg_lambda"] = 2.0
    return Config.from_dict({
        "task": "mq",
        "init_rand_seed": SEED,
        "dataset": {
            "num_classes": NC, "max_seq_len": T, "input_dim": CIN,
            "input_txt_dim": CTXT, "max_segments": 4, "use_text": True,
            "max_text_len": LTXT, "feat_stride": 1.0, "num_frames": 0.0,
            "downsample_rate": 1, "force_upsampling": False,
            "crop_ratio": None, "trunc_thresh": 0.5,
        },
        "model": {
            "backbone_arch": ARCH, "embd_dim": E, "fpn_dim": E,
            "head_dim": E, "n_head": H, "use_abs_pe": True,
            "use_xl": True, "xl_d_inner": 128, "xl_dropout": 0.0,
            "use_cross_modal": True, "n_txt_in": CTXT,
            "compute_dtype": "float32",
            "regression_range": tuple(tuple(r) for r in RR)},
        "train_cfg": {"droppath": 0.0, "dropout": 0.0,
                      "label_smoothing": 0.0, "al_loss_weight": 0.0,
                      "init_loss_norm": INIT_NORM, "loss_weight": 1.0,
                      "center_sample": "radius",
                      "center_sample_radius": 1.5,
                      "clip_grad_l2norm": CLIP},
        "test_cfg": {"pre_nms_thresh": 0.001, "pre_nms_topk": 200,
                     "iou_threshold": 0.1, "min_score": 0.0001,
                     "max_seg_num": 40, "nms_method": "soft",
                     "nms_sigma": 0.99, "duration_thresh": 0.01,
                     "multiclass_nms": True, "voting_thresh": 0.75},
        "cl_cfg": cl,
        "opt": {"type": "adamw", "learning_rate": LR, "weight_decay": WD,
                "warmup": True, "warmup_epochs": WARM_EP,
                "epochs": EPOCHS, "schedule_type": "cosine",
                "mu_dtype": "float32", "nu_dtype": "float32",
                "track_best": True},
        "loader": {"batch_size": NC0 * PER_CLASS_TRAIN, "num_workers": 0},
    }).derived()


def _import_ref_params(tmodel, cfg, tmpl, pad_to=None):
    """torch state dict -> our tree; optionally pad the class axis of the
    cls head + Gaussians from the reference's current width to NC."""
    from vilco_tpu.models.torch_import import (
        load_torch_point_transformer,
        state_dict_to_numpy,
    )

    sd = state_dict_to_numpy(tmodel)
    if pad_to is not None:
        grow = {
            "cls_head.cls_head.conv.weight": 0,
            "cls_head.cls_head.conv.bias": 0,
            "mu": 0, "sigma": 0, "mu_reg_left": 0, "sigma_reg_left": 0,
            "mu_reg_right": 0, "sigma_reg_right": 0,
        }
        for k, axis in grow.items():
            a = sd[k]
            pad = pad_to - a.shape[axis]
            if pad > 0:
                widths = [(0, 0)] * a.ndim
                widths[axis] = (0, pad)
                fill = {"sigma": 1.0, "sigma_reg_left": 1.0,
                        "sigma_reg_right": 1.0}.get(k.split(".")[-1], 0.0)
                if k.endswith("mu_reg_left"):
                    fill = -0.5
                if k.endswith("mu_reg_right"):
                    fill = 0.5
                if k.endswith("conv.bias"):
                    fill = float(a[0])     # prior-prob constant
                sd[k] = np.pad(a, widths, constant_values=fill)
    return jax.tree.map(
        jnp.asarray, load_torch_point_transformer(sd, cfg.model, tmpl))


@pytest.mark.parametrize("method", ["naive", "ewc"])
def test_episode_composition_lockstep(tmp_path, monkeypatch, method,
                                      ref_nms_ext):
    ref = load_reference_mq()
    split, feats_store, text_store, feat_dir, text_dir = _build_split(
        tmp_path)

    rec = _run_reference_episode(ref, ref_nms_ext, tmp_path, method,
                                 feat_dir, text_dir, split, monkeypatch)
    tmodel = rec["model"]

    # ---------------- our side ----------------
    from vilco_tpu.cl.episode import EpisodeRunner
    from vilco_tpu.cl.stream import TaskStream
    from vilco_tpu.models.point_transformer import PointTransformer

    cfg = _our_config(method)
    stream = TaskStream(pickle.loads(pickle.dumps(split["train"])),
                        pickle.loads(pickle.dumps(split["val"])))

    def feature_source(v):
        return feats_store[v["id"]]

    def text_source(v):
        return text_store[v["id"]]

    runner = EpisodeRunner(cfg, stream, feature_source,
                           workdir=str(tmp_path / "ours"),
                           text_source=text_source)

    # identical starting weights: import the reference's INITIAL weights
    # is impossible post-hoc (the episode mutated them), so rebuild the
    # same init by re-seeding — instead we import the init from a twin
    # model constructed with the identical torch generator seed
    twin, _ = _ref_model(ref, tmp_path, NC0,
                         dict(memory_size=MEM_SIZE) if method == "naive"
                         else dict(memory_size=MEM_SIZE, name="ewc",
                                   reg_lambda=2.0))
    tmpl = runner.params
    runner.params = _import_ref_params(twin, cfg, tmpl, pad_to=NC)

    # sync the reference's post-augment fresh rows into our boundary
    # reset (two RNG stacks cannot produce identical fresh draws; the
    # SEMANTICS — which rows are fresh, what the deterministic parts are —
    # are asserted in test part 3 below)
    aug = rec["aug_state"]
    orig_reset = EpisodeRunner._reset_unseen_classes

    def synced_reset(self, j):
        orig_reset(self, j)
        if aug is None:
            return
        p = jax.tree_util.tree_map(lambda x: x, self.params)
        head = p["cls_head"]["cls"]
        # torch conv weight (out, in, k) -> ours (k, in, out)
        w = np.transpose(aug["cls_w"], (2, 1, 0))
        new = jnp.asarray(w)[..., NC0:NC]
        head["kernel"] = head["kernel"].at[..., NC0:NC].set(new)
        head["bias"] = head["bias"].at[NC0:NC].set(
            jnp.asarray(aug["cls_b"][NC0:NC]))
        self.params = p

    monkeypatch.setattr(EpisodeRunner, "_reset_unseen_classes",
                        synced_reset)

    task_params = {}
    current_task = {"j": 0}
    orig_tt = EpisodeRunner.train_task

    runner_norms = {}

    def recording_tt(self, j, n_known):
        current_task["j"] = j
        # one optimizer step per epoch on BOTH sides: batch = all videos
        # of the (memory-merged) task, like the reference driver's
        # per-task batch_size mutation in _run_reference_episode
        n_vids = len(self.stream.train_videos(
            j, self.memory if (self.cfg.cl_cfg.memory_size > 0 and j > 0)
            else None))
        self.cfg = self.cfg.updated(
            loader=self.cfg.loader.updated(batch_size=n_vids))
        if os.environ.get("EPDBG"):
            print(f"[ours] task {j} pre norm={self.loss_normalizer}")
        runner_norms[("pre", j)] = float(self.loss_normalizer)
        out = orig_tt(self, j, n_known)
        if os.environ.get("EPDBG"):
            print(f"[ours] task {j} post norm={self.loss_normalizer}")
        task_params[j] = jax.tree_util.tree_map(np.asarray, self.params)
        runner_norms[j] = float(self.loss_normalizer)
        return out

    monkeypatch.setattr(EpisodeRunner, "train_task", recording_tt)

    # replay the reference DataLoader's per-epoch video order (see the
    # recording note in _run_reference_episode)
    from vilco_tpu.data.pipeline import BatchIterator

    orig_sel = BatchIterator._selections

    def synced_selections(self):
        if not self.is_training:
            return orig_sel(self)
        ids = rec["order"].get((current_task["j"], self.epoch))
        if ids is None:
            return orig_sel(self)
        pos = {v["id"]: i for i, v in enumerate(self.dataset.videos)}
        idx = [pos[i] for i in ids]
        assert len(idx) == len(self.dataset.videos)
        bs = self.batch_size
        return [(idx[b * bs:(b + 1) * bs],
                 [False] * min(bs, len(idx) - b * bs))
                for b in range(max(len(idx) // bs, 1))]

    monkeypatch.setattr(BatchIterator, "_selections", synced_selections)

    eval_series = {}
    orig_eval = EpisodeRunner.evaluate

    def recording_eval(self, j, update_bwf=True):
        out = orig_eval(self, j, update_bwf=update_bwf)
        eval_series.setdefault(j, []).append(
            (out["avg_mAP"], out["avg_R1@0.5"]))
        return out

    monkeypatch.setattr(EpisodeRunner, "evaluate", recording_eval)

    results = runner.run()

    # ---------------- 4. per-epoch eval series + best epoch + BwF -------
    max_epochs = EPOCHS + WARM_EP
    for j in range(2):
        ref_evals = [rec["eval"][(j, ep)]
                     for ep in range(max_epochs // 3, max_epochs)]
        # our recorded evals for task j: the track_best per-epoch evals
        # come first (same count), the final evaluate(j) afterwards
        ours = eval_series[j][:len(ref_evals)]
        for (o_map, o_r15), r in zip(ours, ref_evals):
            np.testing.assert_allclose(o_map, r["mAP"], atol=1e-6)
            np.testing.assert_allclose(o_r15, r["R1_05"], atol=1e-6)
        # best-epoch choice must agree (first-best under strict >)
        ref_best = rec["best_epoch"][j] - max_epochs // 3
        our_scores = [m for m, _ in ours]
        best, cur = 0, -np.inf
        for idx, s in enumerate(our_scores):
            if s > cur:
                cur, best = s, idx
        assert best == ref_best, (our_scores, rec["best_epoch"][j])

        fin = rec["final"][j]
        ev = results["tasks"][j]["eval"]
        np.testing.assert_allclose(ev["avg_mAP"], fin["mAP"], atol=1e-6)
        np.testing.assert_allclose(ev["avg_R1@0.5"], fin["R1_05"],
                                   atol=1e-6)
        np.testing.assert_allclose(ev["BwF_R1@0.5"], fin["BWF_R1_05"],
                                   atol=1e-6)
        np.testing.assert_allclose(ev["BwF_mAP"], fin["BWF_mAP"],
                                   atol=1e-6)

    # ---------------- 2. rehearsal-memory contents ----------------------
    ours_mem = {c: sorted(v["id"] for v in vids)
                for c, vids in runner.memory.data.items()}
    ref_mem = rec["memory"][1]
    assert ours_mem == ref_mem

    # ---------------- 3. grown-head semantics ---------------------------
    # after the task-0 augment, the OLD rows must equal the reference's
    # copied rows and the deterministic new-row parts must match the
    # reference constants. rec["aug_state"] captured the reference head
    # right after augment_classification; our synced_reset injected the
    # random parts, so here we check the deterministic invariants on the
    # reference side and old-row equality implicitly through part 1.
    prior = -float(np.log((1 - 0.01) / 0.01))
    np.testing.assert_allclose(rec["aug_state"]["cls_b"][NC0:],
                               prior, atol=1e-6)
    np.testing.assert_allclose(rec["aug_state"]["mu"][NC0:], 0.0)
    np.testing.assert_allclose(rec["aug_state"]["sigma"][NC0:], 1.0)

    # ---------------- 1. per-task + post-episode params leaf-by-leaf ----
    def _compare(our_tree, ref_sd_model, tag, tol):
        ref_tree = _import_ref_params(
            ref_sd_model, cfg, tmpl,
            pad_to=NC if tag == "task0" else None)
        flat_ours = jax.tree_util.tree_flatten_with_path(our_tree)[0]
        flat_ref = dict(
            ("/".join(str(getattr(p, "key", p)) for p in path), leaf)
            for path, leaf in
            jax.tree_util.tree_flatten_with_path(ref_tree)[0])
        bad = []
        for path, leaf in flat_ours:
            key = "/".join(str(getattr(p, "key", p)) for p in path)
            a = np.asarray(leaf, np.float64)
            b = np.asarray(flat_ref[key], np.float64)
            if tag == "task0" and (key.startswith("cls_head/cls/")
                                   or key in ("mu", "sigma", "mu_reg_left",
                                              "sigma_reg_left",
                                              "mu_reg_right",
                                              "sigma_reg_right")):
                # compare only the rows the 4-wide reference head HAS
                a = a[..., :NC0] if a.shape[-1] == NC else a[:NC0]
                b = b[..., :NC0] if b.shape[-1] == NC else b[:NC0]
            err = float(np.max(np.abs(a - b))) if a.size else 0.0
            scale = float(np.max(np.abs(b))) + 1e-8
            if err > tol * max(scale, 1.0):
                bad.append((key, err, scale))
        assert not bad, f"[{tag}] {len(bad)} leaves diverged: {bad[:10]}"

    class _SdHolder:
        def __init__(self, sd):
            self._sd = sd

        def state_dict(self):
            return {k: torch.from_numpy(v) for k, v in self._sd.items()}

    # Tolerance note: with identical params/inputs/normalizer, the two
    # stacks' gradients still differ by f32 reduction-order noise (~1e-4
    # relative on large-cancellation sums; verified leaf-exact grads at
    # init in this fixture and in test_torch_parity). Adam's first steps
    # are sign-like, so elements whose tiny m-hat flips sign drift a full
    # lr (1e-3) per step — the bound below is that noise floor, NOT a
    # composition artifact: every composition-ORDER signal (per-epoch
    # eval series, best-epoch choice, BwF, memory contents, the
    # loss-normalizer trace) is pinned to 1e-6 or exactly above/below.
    _compare(task_params[0], _SdHolder(rec["task_params"][0]), "task0",
             2.5e-3)
    _compare(runner.params, tmodel, "final", 6e-3)

    # loss-normalizer trace: counts every training forward of the episode
    np.testing.assert_allclose(runner_norms[0], rec["loss_norm"][0],
                               rtol=1e-5)
    np.testing.assert_allclose(runner_norms[1], rec["loss_norm"][1],
                               rtol=1e-5)
    if method == "ewc":
        # the estimation passes advance the EMA between the tasks
        # (on_task_update forwards, EWC.py:37-41)
        np.testing.assert_allclose(runner_norms[("pre", 1)],
                                   rec["loss_norm_post_est"], rtol=1e-5)

    # ---------------- ewc: composition of the importance stack ----------
    if method == "ewc":
        assert rec["reg_params"] is not None
        assert len(runner.reg_list) == 1
        ref_fisher = rec["reg_params"]["fisher"][0]
        # the reference fisher is the LAST estimation batch's grad^2 on
        # the augmented best-ckpt model; map it into our tree and compare
        from vilco_tpu.models.torch_import import (
            load_torch_point_transformer,
        )

        named = {k: v for k, v in ref_fisher.items()}
        sd_like = {k: v.detach().numpy() for k, v in named.items()}
        # fill missing (grad-None) leaves with zeros of the param shape
        for k, v in tmodel.state_dict().items():
            sd_like.setdefault(k, np.zeros_like(v.detach().numpy()))
        ref_imp = load_torch_point_transformer(sd_like, cfg.model, tmpl)
        our_imp = runner.reg_list[0][0]
        flat_r = jax.tree_util.tree_flatten_with_path(ref_imp)[0]
        flat_o = dict(
            ("/".join(str(getattr(p, "key", p)) for p in path), leaf)
            for path, leaf in
            jax.tree_util.tree_flatten_with_path(our_imp)[0])
        bad = []
        for path, leaf in flat_r:
            key = "/".join(str(getattr(p, "key", p)) for p in path)
            a = np.asarray(leaf, np.float64)
            b = np.asarray(flat_o[key], np.float64)
            err = float(np.max(np.abs(a - b))) if a.size else 0.0
            scale = float(np.max(np.abs(a))) + 1e-12
            # fisher = grad^2 at the post-task params, which carry the
            # cross-stack float-noise floor (see the tolerance note
            # above) — 1% relative pins the composition (which batch,
            # which model state, grown rows present) without flaking
            if err > 1e-2 * max(scale, 1e-6):
                bad.append((key, err, scale))
        assert not bad, f"fisher diverged on {len(bad)}: {bad[:10]}"
