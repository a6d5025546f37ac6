package graft

/** Build identity — the reference's version surface
  * (/root/reference/version.go:4-7: `Name` + `Version` constants,
  * printed by the -version flag, cli.go:129-131). */
object BuildInfo {
  val Name: String = "graft-nozzle"
  val Version: String = "0.7.0"
  def versionLine: String = s"$Name version $Version"
}
