# exp5: VidOR BIG-C (RoI+Lang).
# Same config keys as the reference experiments/exp5/config_.py.
model_config = dict(
    num_enti_cats   = 81,
    num_pred_cats   = 51,
    dim_ffn         = 512,
    dim_enti        = 512,
    dim_pred        = 512,
    dim_att         = 512,
    dim_feat        = 1024,
    dim_clsme       = 300,
    enco_pool_len   = 4,
    n_enco_layers   = 2,
    n_deco_layers   = 6,
    n_att_head      = 8,
    num_querys      = 192,
    neg_weight      = 0.1,
    positive_vIoU_th= 0.5,
    use_clsme       = True,
    EntiNameEmb_path= None,
    bias_matrix_path= "prepared_data/pred_bias_matrix_vidor.npy",
    cost_coeff_dict = dict(classification=1.0, adj_matrix=30.0),
    loss_coeff_dict = dict(classification=1.0, adj_matrix=30.0),
    
)
train_dataset_config = dict(
    split = "train",
    ann_dir = "datasets/vidor-dataset/annotation",
    proposal_dir = {i: f"proposals/miss60_minscore0p3/VidORtrain_freq1_part{i+1:02d}" for i in range(14)},
    classeme_dir = "proposals/miss60_minscore0p3/VidORtrain_freq1_classeme",
    dim_boxfeature = 1024,
    min_frames_th = 15,
    max_proposal = 180,
    max_preds = 200,
    score_th = 0.4,
    cache_tag = "MEGAv9_m60s0.3_freq1",
)
test_dataset_config = dict(
    split = "val",
    ann_dir = "datasets/vidor-dataset/annotation",
    proposal_dir = "proposals/miss60_minscore0p3/VidORval_freq1",
    classeme_dir = "proposals/miss60_minscore0p3/VidORval_freq1_classeme",
    video_feature_dir = "datasets/I3D_clip_features/clip16_overlap0.5_val",
    dim_boxfeature = 1024,
    min_frames_th = 15,
    max_proposal = 180,
    max_preds = 200,
    score_th = 0.4,
    cache_tag = "MEGAv9_m60s0.3_freq1",
)
train_config = dict(
    batch_size          = 4,
    total_epoch         = 80,
    initial_lr          = 5e-5,
    lr_decay            = 0.2,
    epoch_lr_milestones = [50],
)
inference_config = dict(topk=3)
