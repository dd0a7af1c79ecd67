# Convenience targets for the TPU-native compression framework.

.PHONY: test test-fast bench pipeline native clean

test:            ## full suite (CPU backend, 8 virtual devices; ~17 min)
	python -m pytest tests/ -q

test-fast:       ## unit tests only (~4.5 min)
	python -m pytest tests/ -q -m "not slow"

bench:           ## headline serving benchmark on the TPU chip (one JSON line)
	python bench.py

bench-family:    ## per-family serving sweep (bf16 / W8A16 / static int8)
	python scripts/family_bench.py

pipeline:        ## full 4-stage pipeline, 5-fold, synthetic data, on device
	python teacher_training/main.py       choice=1 experiment_name=exp num_folds=5 synthetic_size=600 batch_size=32 pretrained=False epochs=8 learning_rate=3e-4
	python knowledge_distillation/main.py choice=1 experiment_name=exp teacher_exp_name=exp num_folds=5 synthetic_size=600 batch_size=32 pretrained=False epochs=8 learning_rate=3e-4
	python pruning/main.py                choice=1 experiment_name=exp source_exp_name=exp num_folds=5 synthetic_size=600 batch_size=32 pretrained=False pruning_ratio=0.11 round_to=8 finetune_epochs=4
	python quantization/main.py           experiment_name=exp model_type=pruned pruning_exp_name=exp num_folds=5 synthetic_size=600 batch_size=32 pretrained=False

native:          ## (re)build the C++ data loader
	g++ -O3 -march=native -shared -fPIC -std=c++17 -o native/libievmloader.so native/dataloader.cpp -lpthread

clean:
	rm -rf output .jax_cache native/libievmloader.so
