"""Pipeline-spec compiler: JSON input events -> DataFrame plans."""
