"""htmlreader_ray: Ray-Data-native main-content extraction engine with the
query/data-processing capabilities of nolanw/HTMLReader (see SURVEY.md)."""

__version__ = "0.1.0"
