"""ScanNet recon-only pretrain config (stage 1).

Mirrors the knob surface of the reference
``projects/configs/mvsdetection/atlas_recon_scannet.py``: model type
``Atlas`` (no detection branch), 160x160x64 train grid, 50 frames, Adam
5e-4, grad-clip 35, 200 epochs, random rotate/translate crop augmentation.
"""

class_names = ['cabinet', 'bed', 'chair', 'sofa', 'table', 'door', 'window',
               'bookshelf', 'picture', 'counter', 'desk', 'curtain',
               'refrigerator', 'showercurtain', 'toilet', 'sink', 'bathtub',
               'garbagebin']

PIXEL_MEAN = [103.53, 116.28, 123.675]
PIXEL_STD = [1.0, 1.0, 1.0]
VOXEL_SIZE = 0.04
N_SCALES = 3
VOXEL_DIM_TRAIN = [160, 160, 64]
VOXEL_DIM_TEST = [256, 256, 96]
NUM_FRAMES_TRAIN = 50
NUM_FRAMES_TEST = 500
RANDOM_ROTATION_3D = True
RANDOM_TRANSLATION_3D = True
PAD_XY_3D = 1.0
PAD_Z_3D = 0.25

optimizer = dict(type='Adam', lr=5e-4)
optimizer_config = dict(grad_clip=dict(max_norm=35, norm_type=2))
lr_config = dict(policy='step', warmup=None, step=[300], gamma=0.1)

work_dir = './work_dirs/atlas_recon_scannet'
save_path = work_dir + '/results'
load_from = None
resume_from = None

total_epochs = 200
checkpoint_config = dict(interval=10)
# mid-training val evaluation every `interval` epochs (reference
# `evaluation = dict(interval=3000, ...)`, ray_marching_scannet.py:47)
evaluation = dict(interval=10)
log_config = dict(interval=10)
seed = 0

recon_pipeline = dict(
    random_rotation=RANDOM_ROTATION_3D,
    random_translation=RANDOM_TRANSLATION_3D,
    padding_xy=PAD_XY_3D,
    padding_z=PAD_Z_3D)

data = dict(
    samples_per_gpu=1,
    workers_per_gpu=2,
    train=dict(
        type='AtlasScanNetDataset',
        data_root='./data/scannet',
        ann_file='./data/scannet/scannet_infos_train.pkl',
        classes=class_names,
        test_mode=False,
        num_frames=NUM_FRAMES_TRAIN,
        voxel_size=VOXEL_SIZE,
        select_type='random',
        voxel_dim=VOXEL_DIM_TRAIN,
        space_mode='recon_random'),
    test=dict(
        type='AtlasScanNetDataset',
        data_root='./data/scannet',
        ann_file='./data/scannet/scannet_infos_val.pkl',
        classes=class_names,
        test_mode=True,
        num_frames=NUM_FRAMES_TEST,
        voxel_size=VOXEL_SIZE,
        select_type='random',
        voxel_dim=VOXEL_DIM_TEST,
        space_mode='recon_test'))

model = dict(
    type='Atlas',
    # stage-1 pretrain runs reduced precision (reference fp16 loss_scale=512,
    # atlas_recon_scannet.py:23); on TPU that is bf16, no loss scaling needed
    compute_dtype='bfloat16',
    pixel_mean=PIXEL_MEAN,
    pixel_std=PIXEL_STD,
    voxel_size=VOXEL_SIZE,
    n_scales=N_SCALES,
    voxel_dim_train=VOXEL_DIM_TRAIN,
    voxel_dim_test=VOXEL_DIM_TEST,
    origin=[0, 0, 0],
    backbone2d_stride=4,
    # auto-loaded Caffe2 R-50 weights (reference fpn.py:142-144); set to a
    # real path before training from stage 1
    backbone2d=dict(pretrained='./data/R-50.pth'),
    loss_weight_recon=1.0,
    feature_2d=dict(output_dim=32, output_stride=4, norm='BN'),
    backbone_3d=dict(
        type='AtlasBackbone3D',
        channels=[32, 64, 128, 256],
        layers_down=[1, 2, 3, 4],
        layers_up=[3, 2, 1],
        norm='BN'),
    tsdf_head=dict(
        type='AtlasTSDFHead',
        input_channels=[32, 64, 128],
        n_scales=3,
        voxel_size=VOXEL_SIZE,
        label_smoothing=1.05,
        sparse_threshold=[0.99, 0.99, 0.99]))
