"""Query-family modules behind the pdftext_spark.queries facade."""
