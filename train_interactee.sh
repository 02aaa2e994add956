# Stage 1
#python train.py --cfg configs/config_vae_interactee.yaml --batch_size 64

# Stage 2
python train.py --cfg configs/config_mld_interactee.yaml --batch_size 64
