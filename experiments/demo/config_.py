# demo: dataset-config presets for tools/dataloader_demo.py — the reference's
# "verify your data is set up" gate (reference experiments/demo/config_.py,
# consumed by reference tools/dataloader_demo.py:38-40 via the key
# f"{dataset_class}_{split}_dataset_config").  Non-path values mirror the
# reference; paths are repo-local.  ``fmt`` selects our tracklet-row parser
# (reference encodes the same choice in the Dataset class name).

######### for PKU without I3D ################
pku_train_dataset_config = dict(
    split = "train",
    ann_dir = "datasets/vidvrd-dataset",
    proposal_dir = "proposals/vidvrd-dataset/PKU_beyond/videovrd_detect_tracking",
    dim_boxfeature = 2048,
    min_frames_th = 5,
    max_proposal = 50,
    max_preds = 100,
    cache_tag = "PKU_v1",
    fmt = "pku",
)

pku_test_dataset_config = dict(
    split = "test",
    ann_dir = "datasets/vidvrd-dataset",
    proposal_dir = "proposals/vidvrd-dataset/PKU_beyond/videovrd_detect_tracking",
    dim_boxfeature = 2048,
    min_frames_th = 5,
    max_proposal = 50,
    max_preds = 100,
    cache_tag = "PKU_v1",
    fmt = "pku",
)

######### for PKU with I3D ################
pku_i3d_train_dataset_config = dict(
    split = "train",
    ann_dir = "datasets/vidvrd-dataset",
    proposal_dir = "proposals/vidvrd-dataset/PKU_beyond/videovrd_detect_tracking",
    i3d_dir = "proposals/vidvrd-dataset/PKU_beyond/videovrd_i3d",
    dim_i3d = 832,
    dim_boxfeature = 2048,
    min_frames_th = 5,
    max_proposal = 50,
    max_preds = 100,
    cache_tag = "PKU_v2",
    fmt = "pku_i3d",
)

pku_i3d_test_dataset_config = dict(
    split = "test",
    ann_dir = "datasets/vidvrd-dataset",
    proposal_dir = "proposals/vidvrd-dataset/PKU_beyond/videovrd_detect_tracking",
    i3d_dir = "proposals/vidvrd-dataset/PKU_beyond/videovrd_i3d",
    dim_i3d = 832,
    dim_boxfeature = 2048,
    min_frames_th = 5,
    max_proposal = 50,
    max_preds = 100,
    cache_tag = "PKU_v2",
    fmt = "pku_i3d",
)

######### for MEGA ################
vidvrd_train_dataset_config = dict(
    split = "train",
    ann_dir = "datasets/vidvrd-dataset",
    proposal_dir = "proposals/vidvrd-dataset/miss30_minscore0p3/VidVRD_train_every1frames",
    dim_boxfeature = 1024,
    min_frames_th = 5,
    max_proposal = 50,
    max_preds = 100,
    cache_tag = "MEGA",
    fmt = "mega",
)

vidvrd_test_dataset_config = dict(
    split = "test",
    ann_dir = "datasets/vidvrd-dataset",
    proposal_dir = "proposals/vidvrd-dataset/miss30_minscore0p3/VidVRD_test_every1frames",
    dim_boxfeature = 1024,
    min_frames_th = 5,
    max_proposal = 150,
    max_preds = 100,
    cache_tag = "MEGA",
    fmt = "mega",
)
