package graft.tools
object GenFixture extends App {
  val lines = graft.model.TaxiFixture.csvLines(600)
  java.nio.file.Files.write(java.nio.file.Paths.get("/tmp/fixture_rides.csv"),
    lines.mkString("\n").getBytes("UTF-8"))
  println(s"[gen] wrote ${lines.size} lines")
}
