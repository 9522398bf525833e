# demo: tiny grounding config for synthetic smoke tests.
model_config = dict(
    dim_feat = 1024,
    dim_clsme = 32,
    dim_hidden = 32,
    num_bins  = 4,
    num_enti_cats = 81,
    num_pred_cats = 51,
    EntiNameEmb_path = None,
    PredNameEmb_path = None,
    loss_factor = dict(classification=1.0, centerness=1.0, regression=1.0),
)
train_dataset_config = dict(split="train")
test_dataset_config = dict(split="val")
train_config = dict(
    batch_size          = 2,
    total_epoch         = 1,
    initial_lr          = 5e-5,
    lr_decay            = 0.2,
    epoch_lr_milestones = [1],
)
inference_config = dict(score_th=0.9, tiou_th=0.5, bins_th=0.2, nms_th=0.8)
