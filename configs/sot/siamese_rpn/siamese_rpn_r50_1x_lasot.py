# SiameseRPN++ R-50 LaSOT (reference: configs/sot/siamese_rpn/...).
_base_ = ["../../_base_/default_runtime.py"]
model = dict(type="SiamRPN")
dataset_type = "LaSOTDataset"
data_root = "data/lasot/"
data = dict(
    test=dict(type=dataset_type,
              ann_file=data_root + "annotations/lasot_test.json",
              img_prefix=data_root + "LaSOTBenchmark", test_mode=True),
)
