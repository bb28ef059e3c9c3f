"""Model definitions: HuBERT encoder, voicebox flow regressor, Sylber facade."""
