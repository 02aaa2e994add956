# STAGE 1: test the trained VAE on the test set
python test.py --cfg configs/config_vae_interactee.yaml

# STAGE 2
#python test.py --cfg configs/config_mld_interactee.yaml
