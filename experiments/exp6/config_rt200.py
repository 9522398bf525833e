# exp6 rt200: VidOR Base-C returning only the top-200 triplets to stage 2
# (paper table-2 "rt200" row).  Values mirror reference
# experiments/exp6/config_rt200.py — identical to config_.py except
# rt_triplets_topk=200 (reference :14) and a train proposal_dir trimmed to
# part01 (the reference file comments out parts 02-14, :43-55).
model_config = dict(
    dataset_type    = "VidOR",
    num_enti_cats   = 81,
    num_pred_cats   = 51,
    dim_ffn         = 512,
    dim_enti        = 512,
    dim_pred        = 512,
    dim_att         = 512,
    dim_feat        = 1024,
    dim_clsme       = 300,
    enco_pool_len   = 4,
    positive_vIoU_th= 0.5,
    rt_triplets_topk = 200,  # return top200 triplets for saving GPU memory when doing the grounding stage
    EntiNameEmb_path= None,
    use_clsme       = True,
    bias_matrix_path= "prepared_data/pred_bias_matrix_vidor.npy",
)
test_dataset_config = dict(
    split = "val",
    video_dir = "datasets/vidor-dataset/val_videos",
    ann_dir = "datasets/vidor-dataset/annotation",
    proposal_dir = "proposals/miss60_minscore0p3/VidORval_freq1",
    classeme_dir = "proposals/miss60_minscore0p3/VidORval_freq1_classeme",
    video_feature_dir = "datasets/I3D_clip_features/clip16_overlap0.5_val",
    max_proposal = 180,
    max_preds = 200,
    score_th = 0.4,
    dim_boxfeature = 1024,
    min_frames_th = 15,
    cache_tag = "MEGAv9_m60s0.3_freq1",
)
train_dataset_config = dict(
    split = "train",
    ann_dir = "datasets/vidor-dataset/annotation",
    video_dir = "datasets/vidor-dataset/train_videos",
    classeme_dir = "proposals/miss60_minscore0p3/VidORtrain_freq1_classeme",
    proposal_dir = {0: "proposals/miss60_minscore0p3/VidORtrain_freq1_part01"},
    cache_dir = "datasets/cache",
    cache_tag = "MEGAv7",
    dim_boxfeature = 1024,
    min_frames_th = 15,
    max_proposal = 180,
    max_preds = 200,
    score_th = 0.4,
)
train_config = dict(
    batch_size          = 4,
    total_epoch         = 80,
    initial_lr          = 5e-5,
    lr_decay            = 0.2,
    epoch_lr_milestones = [50],
)
inference_config = dict(topk=3)
extra_config = dict(
    dataloader_name = "dataloader_vidor",
)
